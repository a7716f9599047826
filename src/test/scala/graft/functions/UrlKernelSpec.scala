package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native URL kernels vs the built-in-composition references — the
  * parity that lets every query run the small-tree single-parse form
  * while the oracle SQL keeps replaying the split_part chain.
  */
class UrlKernelSpec extends SparkSpec {
  import spark.implicits._

  private val urls = Seq(
    "https://www.site1.d2.com/p/3/",
    "HTTP://SITE9.d0.co.uk:8080/p/5?utm=1#sec",
    "https://site2.d3.org/p/7?utm=2",
    "https://www.site0.d0.com.au/p/0/#frag",
    "ftp://a.b.c.d.net/x//",               // deep labels + double slash
    "no-scheme-host.com/path/",            // scheme-less
    "https://bare",                        // no dot, no path
    "https://:8080/x",                     // empty host before port
    "https://www.",                        // www only
    "https://WWW.MiXeD.CaSe.CoM/A/B/",     // case in host vs path
    "",                                    // empty string
    "https://x.co.jp",                     // two-part suffix, no path
    "host.only",                           // bare host, no scheme/path
    "https://über.straße.de/pfad/")        // non-ASCII lowering

  test("native registeredDomain matches the expression-chain reference") {
    val df = urls.toDF("url")
    val mism = df.select(
        UrlFunctions.registeredDomain(col("url")).as("n"),
        UrlFunctions.registeredDomainViaExprs(col("url")).as("h"))
      .where(!(col("n") <=> col("h"))).collect()
    assert(mism.isEmpty, mism.mkString(", "))
  }

  test("native normalizeUrl matches the expression-chain reference") {
    val df = urls.toDF("url")
    val mism = df.select(
        UrlFunctions.normalizeUrl(col("url")).as("n"),
        UrlFunctions.normalizeUrlViaExprs(col("url")).as("h"))
      .where(!(col("n") <=> col("h"))).collect()
    assert(mism.isEmpty, mism.mkString(", "))
  }

  test("null url yields null from both kernels") {
    val df = Seq(Option.empty[String]).toDF("url")
    val r = df.select(
      UrlFunctions.registeredDomain(col("url")).isNull.as("a"),
      UrlFunctions.normalizeUrl(col("url")).isNull.as("b")).collect()(0)
    assert(r.getBoolean(0) && r.getBoolean(1))
  }

  test("kernel plan trees stay small (the construction-blowup guard)") {
    val q = graft.SparkEntry.queries("q148_domain_quota")
    val len = q(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString.length
    assert(len < 20000, s"q148 plan tree is $len chars — inlining is back")
  }
}
