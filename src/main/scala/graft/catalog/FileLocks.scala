package graft.catalog

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

/** B12: acquire/releaseFileLock — the documented narrowing.
  *
  * The reference runs an optimistic time-UUID lock protocol against a
  * Cassandra `createlock` CF because ANY client JVM may create files
  * concurrently (ThriftStore.scala:607-734). In the Spark engine the
  * driver is the single metadata writer, so the lock table collapses to
  * driver-local state with the same winner semantics: first acquirer
  * holds the lock, later contenders fail until release.
  */
object FileLocks {
  private val locks = new ConcurrentHashMap[String, UUID]()

  /** First contender wins and receives the lock token (isCreator ≙
    * ThriftStore.scala:655-671); losers get None.
    */
  def acquire(path: String): Option[UUID] = {
    val token = UUID.randomUUID()
    Option(locks.putIfAbsent(path, token)) match {
      case None => Some(token)
      case Some(_) => None
    }
  }

  /** Release only succeeds with the winning token. */
  def release(path: String, token: UUID): Boolean =
    locks.remove(path, token)

  def isLocked(path: String): Boolean = locks.containsKey(path)
}
