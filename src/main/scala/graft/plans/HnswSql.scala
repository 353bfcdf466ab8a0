package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{UnresolvedException, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType}

import graft.operators.Hnsw
import graft.sources.Tables

/** SQL surface for the GRAPH ANN artifact (round-15 verdict task #4):
  * `graft_knn_stored` reaches the written IVF index from SQL, but the
  * HNSW artifact was DataFrame-only — a SQL user could not probe the
  * graph index at all. The two-phase TVF pattern is proven three times
  * over ([[AsofSql]], [[KnnSql]] ×2); this is its fourth instance:
  *
  * {{{
  *   -- corpus self-probe (vec_id < nQueries, self-excluded):
  *   SELECT * FROM graft_hnsw_stored('/idx/path', 5, 5, 64)
  *                                   -- nQueries, k, ef
  *   -- ef = 2147483647 (Int.MaxValue) is the exhaustive exactness
  *   -- mode: the beam visits every node (the spanning-edge theorem),
  *   -- so the decimal rerank IS the exact top-k (q152's oracle)
  *
  *   -- external query vectors from a relation (qid, embedding):
  *   SELECT * FROM graft_hnsw_stored('/idx/path', 'queries_view', 5, 64)
  * }}}
  *
  * The self-probe form is fully determined by literals, so the builder
  * splices [[Hnsw.searchStored]]'s plan directly (the KnnSql stored
  * discipline); the external form resolves its queries relation
  * two-phase through [[ResolveHnswStoredTvf]]. Both route through the
  * SAME library entry the DataFrame surface uses — one plan, two
  * surfaces, so they can never drift (row-parity in SqlSurfaceSpec).
  * A missing/torn index fails loudly through the GenStore contract
  * naming writeIndex; external searches never self-exclude (the
  * caller's qid space is unrelated to corpus vec_ids — the
  * probeIvfIndex convention). */
case class UnresolvedHnswStoredTvf(path: String, k: Int, ef: Int,
    child: LogicalPlan) extends UnaryNode {
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] = throw new UnresolvedException("output")
  override protected def withNewChildInternal(c: LogicalPlan)
      : UnresolvedHnswStoredTvf = copy(child = c)
}

object ResolveHnswStoredTvf extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedHnswStoredTvf if u.childrenResolved =>
        val cols = u.child.output.map(_.name)
        val missing = Seq("qid", "embedding")
          .filterNot(want => cols.exists(conf.resolver(_, want)))
        if (missing.nonEmpty) throw new IllegalArgumentException(
          s"graft_hnsw_stored: the queries relation must expose " +
            s"(qid, embedding); missing ${missing.mkString(", ")} — " +
            s"it has (${cols.mkString(", ")})")
        val queries = org.apache.spark.sql.GraftSqlShims
          .ofRows(SparkSession.active, u.child)
          .select(col("qid"), col("embedding").as("qvec"))
        Hnsw.searchStored(SparkSession.active, u.path, queries,
          u.k, u.ef).queryExecution.analyzed
    }
}

object HnswSql {

  /** The `graft_hnsw_stored` table-function description for
    * `SparkSessionExtensions.injectTableFunction`. */
  def tvfStored: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan) = (
    FunctionIdentifier("graft_hnsw_stored"),
    new ExpressionInfo(classOf[UnresolvedHnswStoredTvf].getName,
      "graft_hnsw_stored"),
    (args: Seq[Expression]) => {
      require(args.length == 4,
        "graft_hnsw_stored(path, nQueries|queriesView, k, ef) takes " +
          s"exactly 4 arguments, got ${args.length}")
      val path = args(0) match {
        case Literal(v, StringType) if v != null => v.toString
        case e => throw new IllegalArgumentException(
          s"graft_hnsw_stored: argument 1 (index path) must be a " +
            s"string literal, got $e")
      }
      def intArg(i: Int, what: String): Int = args(i) match {
        case Literal(v: Int, IntegerType) => v
        case e => throw new IllegalArgumentException(
          s"graft_hnsw_stored: argument ${i + 1} ($what) must be an " +
            s"integer literal, got $e")
      }
      val k = intArg(2, "k")
      val ef = intArg(3, "ef")
      require(k >= 1, s"graft_hnsw_stored: k must be >= 1, got $k")
      require(ef >= k,
        s"graft_hnsw_stored: ef $ef must be >= k $k")
      args(1) match {
        case Literal(v: Int, IntegerType) => // corpus self-probe form
          require(v >= 1,
            s"graft_hnsw_stored: nQueries must be >= 1, got $v")
          // fully determined by literals — splice the library plan
          // (the index must already exist; GenStore fails loudly)
          Hnsw.searchStored(SparkSession.active, path,
            nQueries = v, k = k, ef = ef).queryExecution.analyzed
        case Literal(view, StringType) if view != null => // external form
          UnresolvedHnswStoredTvf(path, k, ef,
            UnresolvedRelation(view.toString.split('.').toSeq))
        case e => throw new IllegalArgumentException(
          "graft_hnsw_stored: argument 2 must be an integer literal " +
            "(nQueries — corpus self-probe) or a string literal (a " +
            s"queries relation with (qid, embedding)), got $e")
      }
    })

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q146's semantics reached from PURE SQL: the same memoized
    // artifact (shared GraphOps.memo key), the exhaustive beam
    // (ef = Int.MaxValue as an int literal), the same shard fan-out /
    // walk / decimal rerank — so the oracle IS q146's brute-force
    // replay, shared by reference, and the two surfaces can't drift.
    "q152_hnsw_sql" -> ((s, d) => {
      val dir = s"/tmp/graft_hnsw_${new java.io.File(d).getName}"
      graft.operators.GraphOps.memo(s, s"hnsw_store|$d") {
        Hnsw.writeIndex(
          Tables.embeddings(s, d).select(col("vec_id"), col("embedding")),
          dir, nShards = 4, m = 8, efConstruction = 32)
        java.lang.Boolean.TRUE
      }
      s.sql(s"""
        SELECT qid, vec_id, dot, rank
        FROM graft_hnsw_stored('$dir', 5, 5, 2147483647)
        ORDER BY qid, rank""")
    }))

  /** q152 computes EXACTLY what q146 computes (same artifact via the
    * shared memo key, same queries — the index's own vec_id < 5 rows
    * carry the embeddings table's float vectors verbatim — same
    * exhaustive mode), so its oracle IS q146's: shared by reference,
    * not by copy. */
  def oracle: Map[String, String] = Map(
    "q152_hnsw_sql" -> Hnsw.oracle("q146_hnsw_exact"))
}
