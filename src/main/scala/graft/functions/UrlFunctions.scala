package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL hygiene for web-corpus curation (the C4/RefinedWeb front door):
  * host extraction, registered-domain grouping, and canonical-form
  * normalization for URL-level dedup and per-domain capping.
  *
  * Everything is composed from codegen'd string built-ins
  * (split_part / substring_index / instr / substr) — a narrow per-row
  * pass, no UDFs, no regex: at 100 TB this runs at scan speed inside
  * whole-stage codegen and the DuckDB oracle replays the identical
  * split logic. The reference (kaflow) has no URL surface; shapes
  * follow the public C4 (Raffel et al. 2020) and RefinedWeb (Penedo
  * et al. 2023) cleaning descriptions.
  */
object UrlFunctions {

  /** Everything after `scheme://`, or the input unchanged if there is
    * no scheme marker.
    */
  private def afterScheme(url: Column): Column =
    when(instr(url, "://") > 0,
      url.substr(instr(url, "://") + 3, length(url))).otherwise(url)

  /** Lower-cased host: authority minus userinfo-free port, i.e. up to
    * the first `/`, then up to the first `:`. (The synthetic corpus has
    * no userinfo URLs; document the simplification rather than hide it.)
    */
  def host(url: Column): Column = {
    val auth = split_part(afterScheme(url), lit("/"), lit(1))
    lower(split_part(auth, lit(":"), lit(1)))
  }

  /** Host with a single leading `www.` label dropped. */
  def hostNoWww(url: Column): Column = {
    val h = host(url)
    when(h.startsWith("www."), h.substr(lit(5), length(h))).otherwise(h)
  }

  /** eTLD+1-style grouping key: last two labels, or last three when the
    * host ends in a common two-part public suffix. A full public-suffix
    * list is a data file, not an algorithm change — the operator takes
    * the suffix set as a parameter so a production list drops in.
    */
  def registeredDomain(url: Column,
      twoPartSuffixes: Seq[String] = DefaultTwoPartSuffixes): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.RegisteredDomain(
      ColumnBridge.expression(url), twoPartSuffixes))
  }

  /** The built-in-composition reference of [[registeredDomain]] — kept
    * as the spec-pinned parity twin (UrlKernelSpec). The Column DSL
    * copies `h`'s whole subtree into each of its nine uses at
    * construction time, so through a couple of composition layers the
    * expression tree multiplies ~40x per use (q148 measured 9.4 s cold
    * on a 5 k-row input, almost all of it analysis + codegen of a
    * 100 KB+ tree) — never use this form on a real pipeline.
    */
  def registeredDomainViaExprs(url: Column,
      twoPartSuffixes: Seq[String] = DefaultTwoPartSuffixes): Column = {
    val h = hostNoWww(url)
    val isTwoPart = twoPartSuffixes.map(s => h.endsWith("." + s))
      .reduce(_ || _)
    when(isTwoPart, substring_index(h, ".", -3))
      .otherwise(when(instr(h, ".") > 0, substring_index(h, ".", -2))
        .otherwise(h))
  }

  val DefaultTwoPartSuffixes: Seq[String] =
    Seq("co.uk", "com.au", "co.jp", "gov.uk", "ac.uk")

  /** Canonical form for URL-level dedup: lower-cased scheme and host,
    * `www.` dropped, port dropped, query string and fragment dropped,
    * trailing slashes trimmed. Two URLs that differ only in tracking
    * parameters, case, or a trailing slash collapse to one key.
    */
  def normalizeUrl(url: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.NormalizeUrl(
      ColumnBridge.expression(url)))
  }

  /** Built-in-composition reference of [[normalizeUrl]] — parity twin
    * only; see [[registeredDomainViaExprs]] for why.
    */
  def normalizeUrlViaExprs(url: Column): Column = {
    val scheme = lower(when(instr(url, "://") > 0,
      split_part(url, lit("://"), lit(1))).otherwise(lit("https")))
    val rest = afterScheme(url)
    val rawPath = when(instr(rest, "/") > 0,
      rest.substr(instr(rest, "/"), length(rest))).otherwise(lit(""))
    val path = rtrim(
      split_part(split_part(rawPath, lit("#"), lit(1)), lit("?"), lit(1)),
      "/")
    concat(scheme, lit("://"), hostNoWww(url), path)
  }

  /** DuckDB replay of the column logic above, for oracle SQL: each
    * entry is a SQL expression over a column named `url`.
    */
  object Sql {
    val after = "CASE WHEN strpos(url, '://') > 0 THEN substr(url, strpos(url, '://') + 3) ELSE url END"
    val hostExpr = s"lower(split_part(split_part($after, '/', 1), ':', 1))"
    val hostNoWwwExpr = s"CASE WHEN $hostExpr LIKE 'www.%' THEN substr($hostExpr, 5) ELSE $hostExpr END"
    def registeredExpr(twoPart: Seq[String] = DefaultTwoPartSuffixes): String = {
      val cond = twoPart.map(s => s"$hostNoWwwExpr LIKE '%.$s'").mkString(" OR ")
      s"""CASE WHEN $cond
            THEN array_to_string((string_split($hostNoWwwExpr, '.'))[-3:], '.')
            WHEN strpos($hostNoWwwExpr, '.') > 0
            THEN array_to_string((string_split($hostNoWwwExpr, '.'))[-2:], '.')
            ELSE $hostNoWwwExpr END"""
    }
    val normalizedExpr = {
      val scheme = s"lower(CASE WHEN strpos(url, '://') > 0 THEN split_part(url, '://', 1) ELSE 'https' END)"
      val rawPath = s"CASE WHEN strpos($after, '/') > 0 THEN substr($after, strpos($after, '/')) ELSE '' END"
      val path = s"rtrim(split_part(split_part($rawPath, '#', 1), '?', 1), '/')"
      s"($scheme || '://' || $hostNoWwwExpr || $path)"
    }
  }
}
