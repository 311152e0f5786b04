package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Connected components: hand-checked graphs plus a randomized check
  * against a driver-side union-find reference.
  */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("chain, clique, and disjoint pair resolve to min-id labels") {
    // chain 1-2-3-4 (diameter 3: needs real propagation), clique
    // {10,11,12}, pair {20,21}
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L),
      (11L, 12L), (10L, 12L), (21L, 20L)).toDF("src", "dst")
    val got = Components.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("drop list keeps one representative per cluster") {
    val edges = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("src", "dst")
    val dropped = Components.dropList(edges)
      .as[(Long, Long)].collect().toSet
    assert(dropped == Set((2L, 1L), (3L, 1L), (8L, 7L)))
  }

  test("pointerDoubling=false survives a chain deeper than maxIter " +
      "(adaptive switch — round-15 ADVICE: near-dup similarity is not " +
      "transitive, so the clique assumption must not hard-fail)") {
    // path 0-1-...-40: diameter 40 > maxIter 25, so pure linear
    // propagation could never converge inside the round budget; the
    // adaptive switch to pointer doubling after AdaptiveDoublingAfter
    // rounds must finish it
    val edges = (0L until 40L).map(i => (i, i + 1)).toDF("src", "dst")
    // driverMaxEdges = 0 forces the distributed loop — the adaptive
    // switch under test lives there, not in the driver union-find
    val got = Components.connectedComponents(edges,
        pointerDoubling = false, driverMaxEdges = 0)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 41 && got.values.forall(_ == 0L),
      s"chain must collapse to component 0, got $got")
  }

  test("random graph matches a union-find reference") {
    val rnd = new scala.util.Random(11)
    val edgeSeq = Seq.fill(200)((rnd.nextInt(120).toLong,
      rnd.nextInt(120).toLong)).filter { case (a, b) => a != b }
    // driver-side union-find ground truth
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edgeSeq.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edgeSeq.flatMap(e => Seq(e._1, e._2)).distinct
    // canonicalize union-find roots to component-min ids
    val byRoot = nodes.groupBy(find)
    val expected = byRoot.values.flatMap { ns =>
      val m = ns.min; ns.map(_ -> m)
    }.toMap
    // distributed loop (driverMaxEdges = 0 forces it) — the 100 TB
    // shape must match the reference, not just the driver twin
    val got = Components.connectedComponents(edgeSeq.toDF("src", "dst"),
        driverMaxEdges = 0)
      .as[(Long, Long)].collect().toMap
    assert(got == expected)
    // the pointerDoubling=false path (cheaper per round, more rounds on
    // chain graphs) must compute the identical clustering
    val flat = Components.connectedComponents(edgeSeq.toDF("src", "dst"),
        pointerDoubling = false, driverMaxEdges = 0)
      .as[(Long, Long)].collect().toMap
    assert(flat == expected)
    // the bounded driver union-find path (round-16 default under
    // DriverMaxEdges) computes the identical min-id labeling
    val driver = Components.connectedComponents(
        edgeSeq.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(driver == expected,
      "driver union-find must equal the distributed fixpoint")
  }
}
