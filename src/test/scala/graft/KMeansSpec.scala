package graft

import graft.llm.{KMeans, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** k-means quantizer training: the oracle proves bit-equality with
  * DuckDB; these assert the CLUSTERING invariants.
  */
class KMeansSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  test("assignment partitions the vector set; cell sizes are consistent") {
    val out = KMeans.train(spark, sf).persist()
    val n = Tables.embeddings(spark, sf).count()
    assert(out.count() == n, "every vector assigned exactly once")
    assert(out.select(countDistinct(col("vec_id"))).head().getLong(0) == n)
    val cells = out.groupBy(col("centroid_id"), col("n_cell"))
      .agg(count(lit(1)).as("actual")).collect()
    cells.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"cell ${r.getLong(0)}: labeled n_cell=${r.getLong(1)} actual=${r.getLong(2)}"))
    assert(cells.map(_.getLong(2)).sum == n)
    out.unpersist()
  }

  test("Lloyd's iterations do not increase the objective vs the raw seeds") {
    // q_sim_ivf assigns to the SAME seeds (vec_id < K) with the same
    // squared-L2 kernel — its total dist2 is the iteration-0 objective;
    // two UPDATE/ASSIGN rounds must only improve it (Lloyd's monotone
    // convergence), and strictly so on the synthetic corpus.
    val seedObj = Similarity.ivfAssign(spark, sf)
      .agg(sum(col("dist2"))).head().getDouble(0)
    val trainedObj = KMeans.train(spark, sf)
      .agg(sum(col("dist2"))).head().getDouble(0)
    assert(trainedObj <= seedObj, s"objective rose: $seedObj -> $trainedObj")
    assert(trainedObj < seedObj * 0.999, "training was a no-op on data it should move on")
  }

  test("training is deterministic across runs and partitionings") {
    def run(parts: String): Seq[String] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try KMeans.train(spark, sf).collect()
        .map(r => s"${r.getLong(0)}|${r.getLong(1)}|" +
          java.lang.Double.doubleToRawLongBits(r.getDouble(2)) + "|" +
          java.lang.Double.doubleToRawLongBits(r.getDouble(4)))
        .sorted.toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
    assert(run("4") == run("7"), "assignment/centroid bits depend on partitioning")
  }
}
