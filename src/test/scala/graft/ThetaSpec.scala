package graft

import graft.queries.Relational
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Theta-sketch cohort overlap ([[Relational.thetaOverlap]]): the
  * oracle hash-checks the exact twin columns; these assert the SKETCH
  * math — exact-mode equality below the retained-set size, bounded
  * error above it, and partition invariance of the estimates (the
  * retained set is the k smallest hashes of the distinct key set, a
  * pure function of the set).
  */
class ThetaSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** |A| = na keys [0, na), |B| = nb keys [na - overlap, na - overlap + nb). */
  private def keyed(na: Int, nb: Int, overlap: Int, parts: Int) = {
    import spark.implicits._
    val a = (0 until na).map(k => (k.toLong, true, false))
    val b = (0 until nb).map(i => ((na - overlap + i).toLong, false, true))
    (a ++ b).toDF("k", "a", "b").repartition(parts)
  }

  test("exact mode: below 2^lgK retained entries the estimates ARE the exact counts") {
    val (ea, eb, eand, eor) = Relational.thetaEstimates(keyed(300, 200, 50, 3))
    assert(ea == 300.0 && eb == 200.0 && eand == 50.0 && eor == 450.0,
      s"exact-mode estimates drifted: ($ea, $eb, $eand, $eor)")
  }

  test("estimation mode: 10k-key cohorts estimate within the documented error") {
    val (ea, eb, eand, eor) = Relational.thetaEstimates(keyed(10000, 8000, 2000, 5))
    assert(math.abs(ea - 10000) <= 1000, s"|A| est $ea")
    assert(math.abs(eb - 8000) <= 800, s"|B| est $eb")
    assert(math.abs(eand - 2000) <= 2000 * 0.10 + 32, s"|A∩B| est $eand")
    assert(math.abs(eor - 16000) <= 1600, s"|A∪B| est $eor")
  }

  test("estimates are partition-invariant (retained set is a function of the key set)") {
    val e2 = Relational.thetaEstimates(keyed(5000, 5000, 1000, 2))
    val e7 = Relational.thetaEstimates(keyed(5000, 5000, 1000, 7))
    assert(e2 == e7, s"partitioning leaked into theta estimates: $e2 vs $e7")
  }

  test("registered query: gates hold and jaccard is the exact ratio") {
    val r = Relational.aggThetaOverlap(spark, "/root/testdata/sf0.001").collect()
    assert(r.length == 1)
    val row = r.head
    val (nAnd, nOr) = (row.getLong(2), row.getLong(3))
    assert(row.getDouble(4) == nAnd.toDouble / nOr.toDouble)
    (5 to 8).foreach(i => assert(row.getBoolean(i), s"gate $i failed"))
  }
}
