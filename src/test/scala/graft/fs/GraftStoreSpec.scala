package graft.fs

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.must.Matchers

import graft.TestSpark
import graft.catalog.FsCatalog

/** The [[GraftStore]] seam driven END TO END through the trait type —
  * proving the Parquet binding satisfies the reference's store contract
  * (FileSystemStore.scala:29-56) method for method, so a Cassandra
  * binding has a tested interface to slot into.
  */
class GraftStoreSpec extends AnyFlatSpec with Matchers {
  private lazy val spark = TestSpark.spark

  private def newStore(): GraftStore =
    new ParquetStore(spark, subBlockSize = 8, blockSize = 32)

  it must "round-trip inodes and payload through the store contract" in {
    val store = newStore()
    store.createKeyspace()
    store.init()

    // B3/B4: inode upsert + retrieve
    store.storeINode(FsCatalog.dirInode("/docs", "alice"))
    store.retrieveINode("/docs").map(_.isDir) must be(Some(true))
    store.retrieveINode("/missing") must be(None)

    // B5/C1-C4: payload write chunks through the real geometry
    val payload = ("0123456789" * 9).getBytes // 90 B -> 3 blocks, 12 subs
    store.storeFileData("/docs/f1", payload, "alice")
    val node = store.retrieveINode("/docs/f1").get
    node.length must be(90L)
    node.blocks.length must be(3)

    // B7: ordered full reassembly
    store.retrieveBlock("/docs/f1") must be(payload)
    // B6: positioned read with byteRangeStart crossing block boundaries
    new String(store.retrieveSubBlock("/docs/f1", 28L, 8L)) must be(
      new String(payload.slice(28, 36)))
    store.retrieveSubBlock("/docs/f1", 95L, 4L) must be(Array.emptyByteArray)

    // B10: shallow vs deep fetch
    store.storeINode(FsCatalog.dirInode("/docs/sub", "alice"))
    store.storeFileData("/docs/sub/f2", "xy".getBytes, "alice")
    store.fetchSubPaths("/docs", isDeepFetch = false) must be(
      Seq("/docs/f1", "/docs/sub"))
    store.fetchSubPaths("/docs", isDeepFetch = true) must be(
      Seq("/docs/f1", "/docs/sub", "/docs/sub/f2"))

    // B11: every block resolves to the 3-replica ring
    val locs = store.getBlockLocations("/docs/f1")
    locs.size must be(3)
    locs.values.foreach(_.length must be(3))

    // B12: lock protocol (driver-local analog)
    val tok = store.acquireFileLock("/docs/f1")
    tok.isDefined must be(true)
    store.acquireFileLock("/docs/f1") must be(None) // held
    store.releaseFileLock("/docs/f1", tok.get) must be(true)

    // B8/B9: inode and block deletion are independent verbs
    store.deleteBlocks("/docs/f1")
    store.retrieveBlock("/docs/f1") must be(Array.emptyByteArray)
    store.deleteINode("/docs/f1")
    store.retrieveINode("/docs/f1") must be(None)

    // B13
    store.dropKeyspace()
    an[IllegalArgumentException] must be thrownBy
      store.retrieveINode("/docs")
  }

  it must "overwrite payload on re-store (upsert semantics, both planes)" in {
    val store = newStore()
    store.createKeyspace()
    store.storeFileData("/a", "first".getBytes, "u")
    store.storeFileData("/a", "second!".getBytes, "u")
    store.retrieveBlock("/a") must be("second!".getBytes)
    store.retrieveINode("/a").get.length must be(7L)
  }
}
