package graft.fs

import java.io.FileNotFoundException

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.must.Matchers

import graft.TestSpark
import graft.catalog.CatalogBuilder

/** B9: catalog mutations must cascade to the data plane — the reference
  * deletes a file's blocks with its inode (ThriftStore.scala:437-471 via
  * DeleteCommand.scala:40-43). rm must leave zero orphan chunk rows; mv
  * must keep the bytes readable at the new path and gone at the old one.
  */
class GraftFsSpec extends AnyFlatSpec with Matchers {
  private lazy val spark = TestSpark.spark

  private def fixture(): (GraftFs, Array[Byte], Array[Byte]) = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val a = new Array[Byte](75); rnd.nextBytes(a)
    val b = new Array[Byte](44); rnd.nextBytes(b)
    val cat = CatalogBuilder.fromEntries(spark, Seq(
      ("/", true, 0L), ("/d", true, 0L),
      ("/d/a", false, 75L), ("/d/b", false, 44L),
      ("/keep", false, 9L)))
    val chunks = DataPlane.chunk(
      Seq(("/d/a", a), ("/d/b", b), ("/keep", Array.fill(9)(1: Byte)))
        .toDF("path", "data"), 10, 30)
    (GraftFs(cat, chunks), a, b)
  }

  behavior of "GraftFs cascade (B9)"

  it must "delete chunk rows with the inode — cat throws, zero orphans" in {
    val (fs, _, b) = fixture()
    val (fs2, ok) = fs.delete("/d/a", recursive = false)
    ok must be(true)
    an[FileNotFoundException] must be thrownBy fs2.cat("/d/a")
    fs2.chunkSummary("/d/a").collect()(0).getAs[Long]("n_chunks") must be(0L)
    // siblings untouched
    fs2.cat("/d/b").collect()(0).getAs[Array[Byte]]("data") must be(b)
  }

  it must "cascade a recursive directory delete to every chunk underneath" in {
    val (fs, _, _) = fixture()
    val (fs2, ok) = fs.delete("/d", recursive = true)
    ok must be(true)
    fs2.chunkSummary("/d/").collect()(0).getAs[Long]("n_chunks") must be(0L)
    fs2.chunkSummary("/keep").collect()(0).getAs[Long]("n_chunks") must be(1L)
  }

  it must "rename chunks with the subtree — bytes readable at the new path only" in {
    val (fs, a, b) = fixture()
    val (fs2, ok) = fs.rename("/d", "/moved")
    ok must be(true)
    fs2.cat("/moved/a").collect()(0).getAs[Array[Byte]]("data") must be(a)
    fs2.cat("/moved/b").collect()(0).getAs[Array[Byte]]("data") must be(b)
    an[FileNotFoundException] must be thrownBy fs2.cat("/d/a")
    fs2.chunkSummary("/d/").collect()(0).getAs[Long]("n_chunks") must be(0L)
  }

  it must "copy chunks with the subtree — both paths readable, bytes equal" in {
    val (fs, a, _) = fixture()
    val (fs2, ok) = fs.copy("/d", "/dup")
    ok must be(true)
    fs2.cat("/d/a").collect()(0).getAs[Array[Byte]]("data") must be(a)
    fs2.cat("/dup/a").collect()(0).getAs[Array[Byte]]("data") must be(a)
    val (orig, dup) = (fs2.chunkSummary("/d/").collect()(0),
      fs2.chunkSummary("/dup/").collect()(0))
    dup.getAs[Long]("n_chunks") must be(orig.getAs[Long]("n_chunks"))
    dup.getAs[Long]("n_bytes") must be(orig.getAs[Long]("n_bytes"))
  }
}
