// Profiling scratch — run with:
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 16g \
//     --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false \
//     --jars target/scala-2.13/killrweatherspark_2.13-0.1.0.jar -I tools/ProfileDedup.scala
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

val d = "/root/testdata/sf0.1"
def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
}

val docs = spark.read.parquet(s"$d/documents.parquet")
time("noop docs scan")(docs.write.format("noop").mode("overwrite").save())

val toks = docs.select(col("doc_id"), tokens(col("text")).as("t"))
time("tokens only")(toks.write.format("noop").mode("overwrite").save())

val sh3 = docs.select(col("doc_id"), explode(shingles(tokens(col("text")), 3)).as("sh"))
time("shingles explode")(sh3.write.format("noop").mode("overwrite").save())
time("shingles explode again")(sh3.write.format("noop").mode("overwrite").save())

time("distinct")(sh3.distinct().write.format("noop").mode("overwrite").save())

val sig = sh3.groupBy("doc_id").agg(
  min(md5(concat(lit("0|"), col("sh")))).as("mh0"),
  (1 until 12).map(i => min(md5(concat(lit(s"$i|"), col("sh")))).as(s"mh$i")): _*)
time("12x min(md5) agg")(sig.write.format("noop").mode("overwrite").save())

val bands = sig.select(col("doc_id"), posexplode(array((0 until 6).map(b =>
  md5(concat(col(s"mh${2*b}"), col(s"mh${2*b+1}")))): _*))).toDF("doc_id","band","bh")
val cand = bands.as("x").join(bands.as("y"),
  col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
  col("x.doc_id") < col("y.doc_id"))
  .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
time("bands+selfjoin cand")(cand.write.format("noop").mode("overwrite").save())
println(s"[prof] cand count: ${time("cand count")(cand.count())}")

val shD = sh3.distinct()
val sz = shD.groupBy("doc_id").agg(count(lit(1)).as("n"))
val inter = cand
  .join(shD.select(col("doc_id").as("a"), col("sh")), Seq("a"))
  .join(shD.select(col("doc_id").as("b"), col("sh")), Seq("b", "sh"))
  .groupBy("a", "b").agg(count(lit(1)).as("c"))
val res = inter
  .join(sz.select(col("doc_id").as("a"), col("n").as("na")), Seq("a"))
  .join(sz.select(col("doc_id").as("b"), col("n").as("nb")), Seq("b"))
  .withColumn("jaccard", col("c") * lit(1.0) / (col("na") + col("nb") - col("c")))
  .filter(col("jaccard") >= 0.5)
time("full verify pipeline")(res.write.format("noop").mode("overwrite").save())

// ngram: the inverted self-join
val sh4 = docs.select(col("doc_id"), explode(shingles(tokens(col("text")), 4)).as("sh")).distinct()
val pairs = sh4.as("x").join(sh4.as("y"),
  col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
  .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
  .groupBy("a", "b").agg(count(lit(1)).as("c"))
time("4gram inverted selfjoin")(pairs.write.format("noop").mode("overwrite").save())

// top_ngrams
val top = sh3.groupBy("sh").agg(count(lit(1)).as("cnt")).orderBy(desc("cnt"), col("sh")).limit(20)
time("top ngrams")(top.write.format("noop").mode("overwrite").save())
System.exit(0)
