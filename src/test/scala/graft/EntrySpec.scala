package graft

/** The driver contract itself: entry() returns rows on sf0.001, every
  * query has either an oracle or a documented rows-only status, and all
  * oracle SQL references only driver-registered table names.
  */
class EntrySpec extends SparkSpec {

  test("entry() returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle (sketch/sample queries via tolerance anchors)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle without query: ${o -- q}")
    assert(q == o, s"queries without oracle: ${q -- o}")
  }

  test("driver-harness shape: every query output column is atomic-typed") {
    // The driver's comparison sorts results with pandas, which cannot
    // factorize array/map/struct cells (the exact failure that turned
    // q175 red in round 5). House rule: any collected list ships as
    // array_join(…, ' ') — this guard makes the rule structural for the
    // whole surface. Schema construction only; nothing executes.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val dir = "/root/testdata/sf0.001"
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, f) =>
      f(spark, dir).schema.fields.collect {
        case fld if fld.dataType.isInstanceOf[ArrayType] ||
            fld.dataType.isInstanceOf[MapType] ||
            fld.dataType.isInstanceOf[StructType] =>
          s"$name.${fld.name}: ${fld.dataType.simpleString}"
      }
    }
    assert(bad.isEmpty,
      s"non-atomic output columns (driver pandas sort would fail):\n${bad.mkString("\n")}")
  }

  test("oracle SQL references only the driver's table names") {
    val known = Tables.names.toSet
    val tablePattern = "(?i)(?:FROM|JOIN)\\s+([a-z_][a-z0-9_]*)".r
    val cteOrAlias = Set("banded", "banded0", "cand", "inter", "sizes", "losers", "sigs",
      "ids", "sh", "toks", "vocab", "purchases", "signups", "errors", "all_ev",
      "e", "flagged", "numbered", "m", "t", "a", "b", "g", "q", "c", "s", "x",
      "p", "ia", "ib", "sa", "sb", "l", "r", "i", "d", "v", "va", "vb", "pairs",
      "scored", "ranked", "open", "closed", "big", "cent", "cdist", "qdist",
      "assigned", "probed", "j", "verified", "und", "reach", "u", "vals", "cum",
      "cb", "subs", "codedist", "codes", "adc", "t0", "t1", "t2", "t3", "ct",
      "terms", "n", "h", "wins", "tc", "top", "shw", "ids0", "shstats", "w", "f",
      "chunks", "k", "raw", "cells", "rt", "tot", "zk", "tri", "paths",
      "bench", "corpus", "hits", "cleaned", "contaminated",
      "edges", "deg", "r0", "r1", "r2", "r3", "i1", "i2", "i3",
      "c0", "c1", // q208 k-anonymity ladder
      "rel", "pg", "ks", // q210 t-closeness released rows / group counts
      "obs", "grid", "ge", // q212 LOCF resample grid
      "hu", // q213 DP release mixed-uniform stage
      "params", "probes", "est", "exact", // q214 count-min grid replay
      "pe", "ticks", "os", // q216 sliding distinct series
      "s4", "s5", "s6", "c2", "c3", "c4", "c5", "c6",
      "assign", "cnt", // q217 k-center rounds
      "touches", // q219 attribution
      "cps", "nd", // q220 script mix
      "li", // q221 interval lookup cents table
      "d0", "vt", "sel", // q222 KS drift
      "kc", // q223 private release pipeline key counts
      "dv", "md", // q225 MAD deviations / MAD table
      "uni", "bi", "uw", "u1", "u2", // q227 PMI vocab tables
      "mx", "kb", "keys", "rz", "rl", "cz", "cl", // q229 layout audit
      "sf", // q230 skyline suffix-max stage
      "act", "sz", // q232 cohort activity / cohort sizes
      "op", "dg", "dtot", // q233 triangle census stages
      "ek", "ktot", // q236 DOULION sparsified edges / kept count
      "pv", // q240 per-vertex triangle counts
      "ag", // q241 TWA per-key aggregate
      "cd", "nr", "cl2", "cs2", "ws", // q242 golden-record merge stages
      "pr", "gx", // q243 conditional-FD ladder
      "iv", // q244 exact-join intersection table
      "ab", // q245 age-bucket table
      "wr", // q247 Benford worst-digit rollup
      "fp", // q248 fingerprint-key table
      "iv2", "dl", "bt", // q249 sweep-line stages
      "tw", "qa", "lv", "al", "rk", // q235 Hamilton apportionment stages
      "memb", "isup", "posts", "dir", // q250 association-rule stages
      "tr", "sts", "pm", "kk", // q256 Markov stationary stages
      "np", "cp", // q255 Theil-Sen point/pair rollups
      "ev", "f1", "f2", "f3", "n1", "n2", "n3", "g3", // q257 funnel stages
      "checks", // q258 quality-constraint rows
      "dd", "fr", "runs", "ph", "phf", "wstat", "pt", "pw", // q259 RAKE stages
      "anc", // q261 RFM anchor
      "ca", // q262 column-drift side A
      "sess", "qn", "roll", // q263 session-stats stages

      "dup", "occ", "marked", "isl", "dl", "st", "qt", "qv", "dfq", "sc", "tf",
      "spans", "cut", "kept", "cdocs", "px", "hb", "bands", "per_url",
      "sc2", "th", "keep", "keptc", "reb",
      "g1", "g2", "g4", "g8", "st1", "st2", "st4", "st8", // q152 per-config grids
      "per", "perl", "ref", "s1", "s2", "s3", // q153 DoReMi iterations
      "wl", "enc", // q154 fertility
      "perdoc", "rep", "orded", "bx", "xx", // q156 replicate+pack
      "rr", "ss", "pieces", // q157 span corruption
      "tagged", "counts", "tt", "pd", "l1", // q158 token drift
      "cdcch", "sets", "dfreq", "rare", "shr", "jp", "bk", // q159/q161/q163 CDC
      "w0x", "rowsx", "cc", "dd", "tk", // q160 datasheet
      "reasons", // q164 drop-reason report
      "nn", "dimsums", "ml", "cv", "dj", "dk", "mat",
      "w1", "w2", "v1", "v2", // q167 isotropy power-iteration replay
      "lab", "la2", "lb2", // q168/q169 label joins
      "db", "du", // q170 incremental typo join
      "caps", "agg", // q171 packing-efficiency report
      "bt", // q172 bench gram ids
      "nt", // q173 train token total
      "ch", // q182 chunk table
      "sig", "lm", // q180 per-source rollup
      "cl", "sur", "wt", "bd", // q185 pipeline v3 / q184 waterfill
      "cls", "qs", "cj", "mxs", // q187 keep-best representative
      "bch", "cor", "cosv", // q188 semantic decontamination
      "ctoks", "cpp", "cff", "cxx", "caa", "cch", "dfq2", "szs", "jall",
      "tp", "spc", "srk", "sp", "fo", "bcf", "fin", "szs2", // q196/q197 cross-signal
      "ft", "fs", "bo", "sel", "cm", // q189-q193 sampling/packing/fusion
      "smp", "en", "capped", // q194 audio energy hash
      "one", "res", // q265/q266 red-row evidence twins
      "kk", "ex", "uh", "uk", "ua", "ea", "eb", "xa", "xb", // q267 KMV set ops
      "conv", "tch", "nxt", "cr", "rkd", "lin", "pos", "dir",
      "allr", // q268 multi-touch attribution
      "bins", "pp", "tv", // q269 histogram drift
      "a0", "a1", "a2", "h1", "h2", "hp1", "hp2", "ap1",
      "ap2", // q270 HITS iterations
      "gv", "gcum", // q271 quantile normalization
      "best", // q272 feature split audit
      "bnd", "sums", "lgs", "ccx", "mxb", "bst", "y", // q273 lag correlation
      "pr0", "sd", "ns", "rst", // q275 personalized PageRank
      "g3", "g5", // q278 greedy-coverage rounds
      "asn", "szb", "agx", // q279 split leakage
      "lp0", "lp1", "lp2", "lp3", "nb1", "nb2", "nb3",
      "lc1", "lc2", "lc3", // q282 label-propagation rounds
      "topk", "pq", // q283 retrieval-eval stages
      "m0", "m1", "m2", "m3", "m4", "m5", "m6", "m7", "m8", "m9",
      "m10", // q284 MMR rounds
      "ev_ts", "nn_ts", "ch_ts", "ev_user_id", "nn_user_id",
      "ch_user_id", // q285 skip-rate variants
      "jtab", "jh", // q286 LSH-advisor histogram stages
      "lg", "nm", // q287 EWMA lag/numerator stages
      "vs", "es", // q288 degree-mixing vertex/edge moments
      "trn", "pri", "v0", "cf", // q289 Naive Bayes stages
      "ma", "mb", "pc", // q290 kappa marginals / chance term
      "tx", "cn", "gl", "ev2", // q291 Markov-accuracy stages
      "lk", "rk", "lc", "rc", "rn2", "co", "na", // q292 coordinated gates
      "spx", "la", // q293 frequency spectrum
      "rec3", "cat", "cst", "rst", // q294 rec exposure
      "ev_a", "ev_b", "nn_a", "nn_b",
      "ch_a", "ch_b", "pa", // q297 advisor candidates (r10 2-pass form)
      "rkc", "ta", "tb", "mm", "pr2", "tt2", "aa", "bb", // q299 RBO
      "cs", "isum", // q301 dbscan census / per-label id sums
      "ci", // q303 dbscan clusters (per-cluster id sums; cor/cc/e/reach shared)
      "docsl", "embsl", "vr", // q305-q307 sf1 evidence twins (sliced tables)
      "fx", "rungs", "pick", "dgk", "wedk", "trik", // q308 auto-census ladder
      "w0") ++ // BPE oracle stages (p0..pN, pc1..pcN, b1..bN)
      (0 to 16).flatMap(i => Seq(s"p$i", s"pc$i", s"b$i")) ++
      (0 to 16).flatMap(i => Seq(s"e$i", s"w$i")) ++ // q237 k-core peel rounds
      (0 to 8).map(i => s"pi$i") ++ // q256 power-iteration steps
      Set(
      "null") // "IS NOT DISTINCT FROM NULL" matches the FROM pattern
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      tablePattern.findAllMatchIn(sql).map(_.group(1).toLowerCase).foreach { t =>
        assert(known.contains(t) || cteOrAlias.contains(t),
          s"$name references unknown table '$t'")
      }
    }
  }
}
