package graft

import graft.cluster.ConnectedComponents

/** CC correctness vs an in-memory union-find oracle, plus convergence. */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def oracle(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // canonical root = min member id
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, members) =>
      val m = members.min; members.map(_ -> m)
    }.toMap
  }

  private def ccOf(edges: Seq[(Long, Long)]): (Map[Long, Long], Int) = {
    val df = edges.toDF("src", "dst")
    val (out, iters, _) = ConnectedComponents.runWithStats(df)
    (out.as[(Long, Long)].collect().toMap, iters)
  }

  test("chain graph collapses to one component") {
    val edges = (1L until 32L).map(i => (i, i + 1))
    val (got, iters) = ccOf(edges)
    assert(got.values.toSet == Set(1L))
    assert(got.size == 32)
    assert(iters <= 10, s"chain of 32 should converge in O(log n) rounds, took $iters")
  }

  test("disjoint cliques stay separate") {
    val k1 = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val k2 = for (a <- 10L to 14L; b <- (a + 1) to 14L) yield (a, b)
    val (got, _) = ccOf(k1 ++ k2)
    assert(got.filter(_._1 < 10L).values.toSet == Set(1L))
    assert(got.filter(_._1 >= 10L).values.toSet == Set(10L))
  }

  test("self loops and duplicate/reversed edges are harmless") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L), (3L, 2L), (7L, 7L))
    val (got, _) = ccOf(edges)
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L)
    assert(got.get(7L).forall(_ == 7L)) // isolated or absent (caller coalesces)
  }

  test("runMapping equals run minus self-mappings (pipeline contract)") {
    val rng = new scala.util.Random(1717L)
    val n = 50
    val es = Seq.fill(90)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
    val df = es.toDF("src", "dst")
    val full = ConnectedComponents.run(df).as[(Long, Long)].collect().toMap
    val mapping = ConnectedComponents.runMapping(df).as[(Long, Long)].collect().toMap
    // mapping holds exactly the non-root rows of the full output…
    assert(mapping == full.filter { case (id, c) => id != c })
    // …so left-join + coalesce(id) over any node set reconstructs `run`
    assert(full.forall { case (id, c) => mapping.getOrElse(id, id) == c })
  }

  test("random graphs match union-find oracle (seeded property test)") {
    val rng = new scala.util.Random(4242L)
    for (_ <- 1 to 4) { // each case is a full distributed CC run
      val n = 2 + rng.nextInt(60)
      val m = 1 + rng.nextInt(120)
      val es = Seq.fill(m)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      val expected = oracle(es.filter(e => e._1 != e._2))
      val (got, _) = ccOf(es)
      val gotReal = got.filter { case (k, _) => expected.contains(k) }
      assert(gotReal == expected, s"mismatch on edges=$es")
    }
  }
}
