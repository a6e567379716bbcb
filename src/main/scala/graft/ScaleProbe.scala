package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostic for the sf10 probe (not part of the driver
  * contract): band-bucket / candidate-pair distribution behind the
  * MinHash-LSH family, to attribute superlinear walls to candidate
  * density vs plan shape.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = graft.llm.Dedup.shingleDocs(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = graft.llm.Dedup.bandsFromShingles(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hist = bands.groupBy(col("band"), col("band_hash"))
      .agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("buckets"), sum(col("n")).as("rows"),
        max(col("n")).as("max_bucket"),
        sum(col("n") * (col("n") - 1) / 2).as("cand_pairs"))
      .collect()(0)
    println(s"[probe] buckets=${hist.getLong(0)} rows=${hist.getLong(1)} " +
      s"max_bucket=${hist.getLong(2)} cand_pairs=${hist.get(3)}")
    val verified = graft.llm.Dedup.minhashPairs(spark, sfDir).count()
    println(s"[probe] verified_pairs=$verified")

    // fat-bucket cap sensitivity: candidates + verified pairs surviving
    // a per-bucket size cap B (bucket > B dropped before pairing)
    for (cap <- Seq(256, 512)) {
      val sized = bands.join(
        bands.groupBy(col("band"), col("band_hash"))
          .agg(count(lit(1)).as("bn")).filter(col("bn") <= cap),
        Seq("band", "band_hash"))
      val cand = sized.as("a")
        .join(sized.as("b"),
          col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("n_bands"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nCand = cand.count()
      val nVer = cand
        .join(docs.as("da"), col("doc_a") === col("da.doc_id"))
        .join(docs.as("db"), col("doc_b") === col("db.doc_id"))
        .filter(size(array_intersect(col("da.sh"), col("db.sh"))).cast("double") /
          size(array_union(col("da.sh"), col("db.sh"))) >= 0.8)
        .count()
      println(s"[probe] cap=$cap cand=$nCand verified=$nVer")
    }
    spark.stop()
  }
}
