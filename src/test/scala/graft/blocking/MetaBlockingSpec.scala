package graft.blocking

import graft.SparkSpec
import graft.fixtures.AddressFixture
import graft.normalize.Normalizer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token blocking + meta-blocking (J28): recall/reduction trade on the
  * labeled address fixture and pruning invariants. */
class MetaBlockingSpec extends SparkSpec {

  import MetaBlocking.MbConfig

  private val cfg = MbConfig()

  private def norm(df: DataFrame): DataFrame =
    df.withColumn("address_norm", Normalizer.normalizeAddress(col("address")))

  private def weights: DataFrame =
    MetaBlocking.pairWeights(
      norm(AddressFixture.left(spark, sf0001)),
      norm(AddressFixture.rightAll(spark, sf0001)),
      cfg, idCol = "id", textCol = "address_norm")

  private def goldIn(m: DataFrame): Long =
    m.filter(col("right_id") === concat(lit("r"), col("left_id")) ||
      col("right_id") === concat(lit("s"), col("left_id"))).count()

  test("WEP keeps every gold pair while pruning the candidate graph") {
    val w = weights.cache()
    val pruned = MetaBlocking.wep(w).cache()
    val nLeft = AddressFixture.left(spark, sf0001).count()
    assert(goldIn(pruned) == 2 * nLeft, "WEP dropped a gold pair")
    assert(pruned.count() < w.count(), "WEP pruned nothing")
    // weights are sane: cbs >= 1, jacc in (0, 1]
    assert(w.filter(col("cbs") < 1 || col("jacc") <= 0 || col("jacc") > 1).count() == 0)
    w.unpersist(); pruned.unpersist()
  }

  test("CNP keeps at most k neighbors per left and is a subset of the graph") {
    val w = weights.cache()
    val top = MetaBlocking.cnp(w, cfg.cnpK).cache()
    val overK = top.groupBy("left_id").count().filter(col("count") > cfg.cnpK).count()
    assert(overK == 0)
    assert(top.join(w, Seq("left_id", "right_id"), "left_anti").count() == 0)
    // near-full gold recall at k=3 (ties may displace at most a few)
    val nLeft = AddressFixture.left(spark, sf0001).count()
    val recall = goldIn(top).toDouble / (2 * nLeft)
    info(s"CNP@${cfg.cnpK} gold recall = $recall")
    assert(recall >= 0.99, s"CNP recall $recall below 0.99")
    w.unpersist(); top.unpersist()
  }

  test("block purging drops frequent structural tokens") {
    val left = norm(AddressFixture.left(spark, sf0001))
    val lm = MetaBlocking.membership(left, "id", "address_norm")
    // "mahalle" appears in every normalized address -> must be purged
    // by any cap below 1.0; surviving blocks bound the join fan-out
    val n = left.count()
    val cap = math.floor(cfg.maxBlockFrac * n).toLong
    val oversize = lm.groupBy("tok").count().filter(col("count") > cap)
    assert(oversize.filter(col("tok") === "mahalle").count() == 1)
  }
}
