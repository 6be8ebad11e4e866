package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for every suite (sbt forks a single test JVM). */
object GraftTestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // plan-quality specs assert on PushedFilters contents; the default
      // 100-char metadata truncation would hide filters pushed later in
      // the list (q6 gained IsNotNull(l_discount) once centi became
      // floor-based and the shipdate bound fell off the rendered prefix)
      .config("spark.sql.maxMetadataStringLength", "500")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    QuietLogs.quietBenignWindowWarnings()
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}
