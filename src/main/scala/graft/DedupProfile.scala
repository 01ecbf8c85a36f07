package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
object DedupProfile {
  def force(df: DataFrame): Unit = { df.agg(bit_xor(xxhash64(struct(df.columns.map(col): _*)))).collect(); () }
  def t[T](n: String)(f: => T): T = { val t0 = System.nanoTime(); val r = f; println(f"[dp] $n%-24s ${(System.nanoTime()-t0)/1e9}%7.3f s"); r }
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.dedup.DedupOps
    val docs = Tables.documents(spark, d)
    docs.count()
    (1 to 2).foreach { i =>
      println(s"--- rep $i")
      val sh = t("shingle+checkpoint")(DedupOps.withShingles(docs, "doc_id", "text", 3).localCheckpoint(false))
      t("shingle count")(sh.count())
      val sigs = DedupOps.signaturesFromShingles(sh, "doc_id", 12)
      t("sigs")(force(sigs))
      val bands = DedupOps.lshBandKeys(sigs, "doc_id", 6, 2)
      t("bands")(force(bands))
      val cands = DedupOps.lshCandidatePairs(bands, "doc_id")
      t("cands")(force(cands))
      println("n_cands=" + cands.count())
      t("verify")(force(DedupOps.jaccardVerify(cands, sh, "doc_id", 0.5)))
      t("d03 full")(force(DedupOps.nearDupPairs(docs, "doc_id", "text", 3, 12, 6, 0.5)))
    }
    spark.stop()
  }
}
