// Profiling scratch — run with:
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 16g \
//     --conf spark.sql.shuffle.partitions=8 --conf spark.ui.enabled=false \
//     --jars target/scala-2.13/killrweatherspark_2.13-0.1.0.jar -I tools/ProfileFunnel.scala
import org.apache.spark.sql.functions._

val d = "/root/testdata/sf0.1"
def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"[prof] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
}
def run(name: String, label: String): Unit =
  time(label)(graft.SparkEntry.queries(name)(spark, d)
    .write.format("noop").mode("overwrite").save())

run("dedup_keep_list", "keep_list cold (warms artifacts)")
run("pipe_curation_funnel", "funnel 1")
run("pipe_curation_funnel", "funnel 2")
run("pipe_audit_trail", "audit 1")
run("pipe_audit_trail", "audit 2")
run("graph_pagerank", "pagerank (warms symEdges+nodes)")
run("graph_kcore", "kcore 1")
run("graph_kcore", "kcore 2")
run("rel_basket_lift", "basket_lift 1")
run("rel_basket_lift", "basket_lift 2")
System.exit(0)
