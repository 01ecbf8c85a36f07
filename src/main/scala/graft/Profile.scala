package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the dedup pipelines. */
object Profile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    import graft.dedup.DedupOps
    val docs = Tables.documents(spark, d)
    time("warmup count")(docs.count())
    val sh = DedupOps.withShingles(docs, "doc_id", "text", 3)
    time("shingles")(sh.count())
    val ex = sh.select(col("doc_id"), explode(col("shingles")).as("s"))
    time("explode")(ex.count())
    time("inter-join")(
      ex.select(col("doc_id").as("id_a"), col("s"))
        .join(ex.select(col("doc_id").as("id_b"), col("s")), Seq("s"))
        .filter(col("id_a") < col("id_b")).count())
    time("inter-grouped")(
      ex.select(col("doc_id").as("id_a"), col("s"))
        .join(ex.select(col("doc_id").as("id_b"), col("s")), Seq("s"))
        .filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b").count().count())
    val sigs = DedupOps.minhashSignatures(docs, "doc_id", "text", 3, 12)
    time("minhash sigs")(sigs.count())
    val bands = DedupOps.lshBandKeys(sigs, "doc_id", 6, 2)
    time("band keys")(bands.count())
    val cands = DedupOps.lshCandidatePairs(bands, "doc_id")
    time("cand pairs")(cands.count())
    time("d03 full")(DedupOps.nearDupPairs(docs, "doc_id", "text", 3, 12, 6, 0.5).count())
    time("d05 full")(DedupOps.jaccardAllPairs(sh, "doc_id", 0.5).count())
    // native vs composable cosine kernel on the all-pairs clustered search
    import graft.ann.Knn
    import graft.expressions.GraftFunctions
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, d)
    time("knn composed x3") {
      (1 to 3).foreach(_ => Knn.clusteredTopK(e, "vec_id", "embedding", "label", 3).count())
    }
    time("knn native x3") {
      (1 to 3).foreach(_ => Knn.clusteredTopK(e, "vec_id", "embedding", "label", 3,
        simFn = (a, b) => call_function("cosine_sim", a, b)).count())
    }
    spark.stop()
  }
}
