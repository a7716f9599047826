package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(url: String): (String, String, String) = {
    val r = Seq(url).toDF("url").select(
      UrlFunctions.hostNoWww(col("url")),
      UrlFunctions.registeredDomain(col("url")),
      UrlFunctions.normalizeUrl(col("url"))).head()
    (r.getString(0), r.getString(1), r.getString(2))
  }

  test("host, registered domain, and normal form across URL shapes") {
    // case + www + port + query + fragment + trailing slash all collapse
    assert(one("HTTP://www.Sub.Example.COM:8080/A/b/?q=1#f") ==
      (("sub.example.com", "example.com", "http://sub.example.com/A/b")))
    // two-part public suffix keeps three labels
    assert(one("https://news.bbc.co.uk/sport") ==
      (("news.bbc.co.uk", "bbc.co.uk", "https://news.bbc.co.uk/sport")))
    // no scheme, no path: https assumed, empty path, bare host
    assert(one("example.org") ==
      (("example.org", "example.org", "https://example.org")))
    // dotless host falls back to itself
    assert(one("https://localhost:9000/x") ==
      (("localhost", "localhost", "https://localhost/x")))
    // root path trims to empty; www alone is stripped
    assert(one("https://www.d.net/") == (("d.net", "d.net", "https://d.net")))
  }

  test("normalization collapses tracking variants to one dedup key") {
    val urls = Seq(
      "https://a.com/page",
      "https://A.COM/page/",
      "HTTP://www.a.com/page?utm_source=x",
      "https://a.com/page#top").toDF("url")
    val keys = urls.select(UrlFunctions.normalizeUrl(col("url")).as("k"))
      .distinct().as[String].collect().toSet
    // scheme stays distinct (http vs https), everything else collapses
    assert(keys == Set("https://a.com/page", "http://a.com/page"))
  }
}
