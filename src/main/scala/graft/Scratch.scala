package graft

import org.apache.spark.sql.functions._

// temporary measurement harness — deleted after use
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("scratch", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    var t0 = System.nanoTime()
    val pairs = graft.ops.Dedup.minhashPairs(docs, 3, 8, 4, 0.5)
      .select(col("id_a"), col("id_b")).localCheckpoint(true)
    println(f"pairs materialize: ${(System.nanoTime()-t0)/1e9}%.2f s, n=${pairs.count()}")
    t0 = System.nanoTime()
    val comp = graft.ops.Dedup.components(pairs)
    println(f"components: ${(System.nanoTime()-t0)/1e9}%.2f s, n=${comp.count()}")
    t0 = System.nanoTime()
    val comp2 = graft.ops.Dedup.components(pairs)
    println(f"components again: ${(System.nanoTime()-t0)/1e9}%.2f s, n=${comp2.count()}")
    spark.stop()
  }
}
