package graft.fs

import java.net.URI

/** A11: uri/cwd session bookkeeping (reference SnackFS.scala:51-85).
  *
  * The reference's `initialize` derives the system URI from the mount
  * URI's scheme+authority and seats the working directory at
  * `/user/<username>`; `makeAbsolute` resolves relative paths against
  * the cwd and `setWorkingDirectory` itself goes through `makeAbsolute`.
  * Pure driver-side state — nothing here touches data, so it stays a
  * tiny immutable value (each transition returns a new context, matching
  * FsCatalog's transition style).
  */
final case class FsContext(uri: URI, cwd: String) {

  /** Resolve a possibly-relative path against the cwd and normalize
    * `.`/`//` segments like Hadoop Path — plus `..` collapsing, which is
    * an INTENTIONAL divergence: the reference (SnackFS.makeAbsolute via
    * Hadoop Path) leaves `..` segments in place, so `/a/../b` stays a
    * distinct catalog key from `/b` there; resolving them here means one
    * canonical key per real location.
    */
  def makeAbsolute(path: String): String = {
    val joined = if (path.startsWith("/")) path else s"$cwd/$path"
    val stack = joined.split("/").foldLeft(List.empty[String]) {
      case (acc, "" | ".") => acc
      case (acc, "..") => if (acc.isEmpty) acc else acc.tail
      case (acc, seg) => seg :: acc
    }
    "/" + stack.reverse.mkString("/")
  }

  /** Fully-qualified form: scheme://authority + absolute path
    * (SnackFS.makeQualified via Hadoop Path).
    */
  def makeQualified(path: String): String = s"$uri${makeAbsolute(path)}"

  /** setWorkingDirectory resolves THROUGH makeAbsolute — `cd foo` from
    * /user/graft lands on /user/graft/foo (SnackFS.scala:80-82).
    */
  def withWorkingDir(dir: String): FsContext = copy(cwd = makeAbsolute(dir))
}

object FsContext {

  /** SnackFS.initialize:55-58 — system URI keeps only scheme+authority;
    * cwd starts at /user/<username>.
    */
  def initialize(mountUri: String, user: String = "graft"): FsContext = {
    val u = URI.create(mountUri)
    require(u.getScheme != null, s"mount URI needs a scheme: $mountUri")
    val authority = Option(u.getAuthority).getOrElse("")
    FsContext(URI.create(s"${u.getScheme}://$authority"), s"/user/$user")
  }
}
