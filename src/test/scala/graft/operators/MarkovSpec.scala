package graft.operators

import graft.SparkSpec

class MarkovSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  /** One user walking the given state sequence at 1-second steps. */
  private def walk(user: Long, states: Seq[String], t0: Long = 0L) =
    states.zipWithIndex.map { case (st, i) =>
      (user, ts(t0 + i), i.toLong, st)
    }

  private def run(rows: Seq[(Long, java.sql.Timestamp, Long, String)],
                  iters: Int = 8) =
    Markov.stationaryDistribution(
        rows.toDF("u", "ts", "eid", "st"), "u", "ts", "eid", "st", iters)
      .collect().map(r => r.getAs[String]("state") ->
        r.getAs[Long]("pi_ppm")).toMap

  test("alternating 2-state chain: exact 50/50 at any iteration count") {
    val rows = walk(1L, Seq.fill(10)(Seq("A", "B")).flatten)
    assert(run(rows, 1) == Map("A" -> 500000L, "B" -> 500000L))
    assert(run(rows, 8) == Map("A" -> 500000L, "B" -> 500000L))
  }

  test("absorbing state collects all mass; dangling state self-loops") {
    // A -> B and B -> B: B absorbs
    val rows = walk(1L, Seq("A", "B", "B", "B"))
    assert(run(rows) == Map("A" -> 0L, "B" -> 1000000L))
    // A -> B with B never a source: the dangling self-loop parks mass
    val dangling = walk(1L, Seq("A", "B"))
    assert(run(dangling) == Map("A" -> 0L, "B" -> 1000000L))
  }

  test("3-cycle: uniform thirds, floored once at init, mass conserved after") {
    val rows = walk(1L, Seq.fill(7)(Seq("A", "B", "C")).flatten)
    val out = run(rows)
    // init 333333 each (1e6 div 3); a pure rotation keeps the values
    assert(out == Map("A" -> 333333L, "B" -> 333333L, "C" -> 333333L))
  }

  test("order within a key comes from (ts, seq); users are independent") {
    // user 1 SHUFFLED rows still give A->B->A->B...; user 2's C-island
    // self-contained
    val u1 = walk(1L, Seq("A", "B", "A", "B", "A"))
    val u2 = walk(2L, Seq("C", "C", "C"))
    val out = run(scala.util.Random.shuffle(u1 ++ u2))
    // chain: A<->B (from u1), C->C (from u2) — three states, C isolated
    assert(out("C") == 333333L)
    assert(out("A") + out("B") == 666666L)
  }

  test("no transitions fails loudly; maxStates guard fires") {
    intercept[IllegalArgumentException] {
      run(walk(1L, Seq("A"))) // a single event yields no transition
    }
    intercept[IllegalArgumentException] {
      Markov.stationaryDistribution(
        walk(1L, Seq("A", "B", "C")).toDF("u", "ts", "eid", "st"),
        "u", "ts", "eid", "st", iters = 2, maxStates = 2).collect()
    }
  }
}
