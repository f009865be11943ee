package graft

import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends SparkSpecBase {
  import spark.implicits._

  test("components: chains, cycles, isolated nodes, min-label canonicals") {
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L).toDF("id")
    val edges = Seq(
      (3L, 2L), (2L, 1L),            // chain 1-2-3
      (4L, 5L), (5L, 6L), (6L, 4L),  // cycle 4-5-6
      (8L, 9L)                       // pair; 7 isolated
    ).toDF("src", "dst")
    val got = ConnectedComponents.components(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L, 7L -> 7L, 8L -> 8L, 9L -> 8L))
  }

  test("components: long path (diameter >> maxIters without jumping) converges") {
    // path 1-2-...-80: propagation alone would need 79 rounds — far
    // past the default maxIters=25. Pointer jumping covers it in
    // O(log 80) rounds, so this converges (and proves the jump works).
    val n = 80L
    val nodes = (1L to n).toDF("id")
    val edges = (1L until n).map(i => (i, i + 1)).toDF("src", "dst")
    val got = ConnectedComponents.components(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 80 && got.values.toSet == Set(1L))
  }

  test("dupGroups: only multi-member components, with keeper and size") {
    val nodes = Seq(1L, 2L, 3L, 10L).toDF("id")
    val edges = Seq((2L, 3L)).toDF("src", "dst")
    val got = ConnectedComponents.dupGroups(nodes, edges)
      .select("id", "keep_id", "group_size")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((2L, 2L, 2L), (3L, 2L, 2L))) // 1 and 10 are not dups
  }
}
