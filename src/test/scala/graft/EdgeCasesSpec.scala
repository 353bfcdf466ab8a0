package graft

import org.apache.spark.sql.functions._

import graft.operators.{TextOps, VectorOps}

/** Degenerate-input behavior of the reusable cores: empty and singleton
  * corpora must produce empty/sane results, never throw — on a real
  * pipeline an empty partition, a filtered-out day, or a cold-start
  * stream hits these constantly. */
class EdgeCasesSpec extends SparkSpecBase {
  import spark.implicits._

  test("clusterAssignments: empty and singleton corpora") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextOps.clusterAssignments(empty).count() == 0)
    val one = Seq((7L, "only doc in the corpus right now")).toDF("doc_id", "text")
    assert(TextOps.clusterAssignments(one).collect().toSeq ==
      Seq(org.apache.spark.sql.Row(7L, 7L)))
  }

  test("minLabelPropagate: empty edge list on both resolver paths") {
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(TextOps.minLabelPropagate(empty).count() == 0)
    // -1 genuinely forces the distributed star loop: the gate is
    // `count <= localMaxEdges`, so 0 would still take the local path
    assert(TextOps.minLabelPropagate(empty, localMaxEdges = -1L).count() == 0)
  }

  test("similarity search: empty corpus and queries selecting nothing") {
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(VectorOps.dotTopKFrom(empty).count() == 0)
    assert(VectorOps.ivfTopKFrom(empty).count() == 0)
    // non-empty corpus, but no vec_id under the query cutoff → no results
    val corpus = (100L until 120L)
      .map(i => (i, Seq.tabulate(64)(d => (i + d).toFloat)))
      .toDF("vec_id", "embedding")
    assert(VectorOps.dotTopKFrom(corpus, nQueries = 5).count() == 0)
    assert(VectorOps.ivfTopKFrom(corpus, nQueries = 5, cells = 4).count() == 0)
  }
}
