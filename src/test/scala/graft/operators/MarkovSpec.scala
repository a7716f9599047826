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

  // the square-recombined user mix (see nextEventAccuracy scaladoc)
  private def isTrain(id: Long): Boolean = {
    val p = 1000000007L
    val km = ((id % p) + p) % p
    ((((km * km % p) * 1000003L + km * 12345L + 17L) % p + p) % p) % 1000 < 800
  }

  test("nextEventAccuracy: hand split — model beats the context-free baseline") {
    // pick real train/eval users under the square-recombined mix.
    // Train chains are strictly alternating a<->b, so the model
    // predicts the eval user's alternation perfectly while the
    // context-free baseline (global next counts tie -> smallest
    // label "a") only hits the b->a half.
    var eid = 0L
    def walk(u: Long, states: Seq[String]) = states.zipWithIndex.map {
      case (st, i) => eid += 1; (u, i.toLong, eid, st)
    }
    val trainUsers = (0L until 100L).filter(isTrain).take(10)
    val evalUser = (0L until 100L).find(u => !isTrain(u)).get
    val rows = trainUsers.flatMap(u =>
      walk(u, Seq("a", "b", "a", "b", "a"))) ++
      walk(evalUser, Seq("a", "b", "a", "b"))
    val out = Markov.nextEventAccuracy(
      rows.toDF("u", "ts", "eid", "st"), "u", "ts", "eid", "st")
      .collect().map(r => r.getAs[String]("from_type") ->
        ((r.getAs[String]("predicted"), r.getAs[Long]("n"),
          r.getAs[Long]("hits"), r.getAs[Long]("acc_ppm"),
          r.getAs[Long]("base_hits")))).toMap
    // eval transitions: a->b, b->a, a->b
    assert(out("a") == (("b", 2L, 2L, 1000000L, 0L))) // baseline "a" misses
    assert(out("b") == (("a", 1L, 1L, 1000000L, 1L))) // baseline "a" hits
  }

  test("nextEventAccuracy: argmax ties break to the smallest label; unseen from-state predicts null") {
    var eid = 0L
    def walk(u: Long, states: Seq[String]) = states.zipWithIndex.map {
      case (st, i) => eid += 1; (u, i.toLong, eid, st)
    }
    // train: from "a" the next is once "b", once "c" -> tie -> "b"
    val tr = (0L until 100L).filter(isTrain).take(2)
    val ev = (0L until 100L).filter(u => !isTrain(u)).take(2)
    val rows = walk(tr(0), Seq("a", "b")) ++ walk(tr(1), Seq("a", "c")) ++
      walk(ev(0), Seq("a", "c")) ++ // eval: predicted b, miss
      walk(ev(1), Seq("z", "a")) // eval: from-state z unseen in train
    val out = Markov.nextEventAccuracy(
      rows.toDF("u", "ts", "eid", "st"), "u", "ts", "eid", "st")
      .collect().map(r => r.getAs[String]("from_type") ->
        ((Option(r.getAs[String]("predicted")), r.getAs[Long]("n"),
          r.getAs[Long]("hits")))).toMap
    assert(out("a") == ((Some("b"), 1L, 0L)))
    assert(out("z") == ((None, 1L, 0L)))
  }
}
