package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{
  Add, Alias, And, Attribute, AttributeReference, BinaryComparison, Cast,
  DateAdd, DateAddInterval, EqualNullSafe, EqualTo, Explode, Expression,
  Greatest, GreaterThan, GreaterThanOrEqual, If, IntegralDivide, Least,
  LessThan, LessThanOrEqual, Literal, Pmod, RaiseError, Sequence,
  Subtract, TimestampAddInterval, UnixDate}
import org.apache.spark.sql.catalyst.expressions.aggregate.Max
import org.apache.spark.sql.catalyst.plans.{
  Inner, JoinType, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate, Filter, Generate, Join, Limit, LogicalPlan, Project,
  SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{
  ArrayType, ByteType, CalendarIntervalType, DataType, DateType,
  DayTimeIntervalType, IntegerType, LongType, ShortType, TimestampType}
import org.apache.spark.unsafe.types.CalendarInterval

/** Optimizer rule: detect a join whose ONLY cross-side predicate is a
  * pure band (`lo <= x AND x < hi` in any strictness combination, NO
  * equi key) and rewrite it to the bin-bucketed equijoin shape of
  * [[graft.operators.IntervalJoin.pointInInterval]] — so the NAIVE
  * DataFrame/SQL form a user actually writes gets the scale-safe plan,
  * not just callers who know the library entry point by name. Without
  * the rewrite Spark plans BroadcastNestedLoopJoin (or a cartesian):
  * O(|points|·|intervals|) comparisons, the all-pairs scale killer.
  *
  * Join types: the rewrite explodes the INTERVAL side, and exploding a
  * side whose unmatched rows the join preserves (or whose rows ARE the
  * output) would multiply them — so each type admits only the
  * orientations where the exploded side is "safe":
  *
  *   - INNER: both orientations (each matching pair survives at
  *     exactly one bin — the exactly-once argument below);
  *   - LEFT SEMI / LEFT ANTI (the range-`EXISTS` / `NOT EXISTS` SQL
  *     shapes): point side on the LEFT — the right side may explode
  *     freely because semi/anti only test match-existence, which the
  *     bin conjunct preserves (a point's bin is always in its covering
  *     interval's exploded bins);
  *   - LEFT OUTER: point side on the LEFT — matched pairs survive
  *     exactly once and unmatched left rows null-extend exactly as
  *     before (pre-filtered interval rows could never have matched);
  *   - RIGHT OUTER: point side on the RIGHT (the mirror image).
  *
  * An outer/semi/anti band join with the INTERVAL side as the
  * preserved/output side stays untouched (rewriting it would need a
  * row-identity to dedup the exploded side — a match-then-anti-union
  * plan — which costs more than it saves at the sizes where the
  * preserved side is the dimension-like interval table).
  *
  * Rewrite (see the IntervalJoin object doc for the exactly-once
  * argument):
  *
  *   - the band's point side gains one derived column
  *     `_gbin_p = floorDiv(x, w)`;
  *   - the interval side is pre-filtered to `lo <= hi` (rows that can
  *     match nothing — including null bounds — exactly as the naive
  *     inner join drops them) and explodes to covered bins
  *     `floorDiv(lo, w) .. floorDiv(hi, w)` (the inclusive upper bin is
  *     a superset for every strictness combination; the original
  *     predicate still runs on each candidate pair);
  *   - the join gains the equi conjunct `_gbin_p = _gbin_i` and keeps
  *     the original band predicate, so Spark's own JoinSelection plans
  *     a hash/merge join on the bin — broadcast when small, shuffled
  *     when not, AQE-skew-splittable either way;
  *   - a top Project restores the original output schema.
  *
  * Bin width, in priority order:
  *
  *   1. STRUCTURAL: the interval side's `hi` is provably `lo + c` for
  *      a positive literal `c` (the common derived-window shape — then
  *      every interval covers ≤ 2 bins). The span's unit is the unit
  *      of the matched arithmetic itself: an integral `Add` is already
  *      in the point's binning unit (timestamps bin on their
  *      floor-SECONDS cast, and the only integral adds reachable under
  *      a timestamp comparison are second-typed long arithmetic), and
  *      a `ts + INTERVAL` (TimestampAddInterval with a literal
  *      day-time interval) carries MICROseconds, scaled down to
  *      seconds here. Deriving the unit from the point's type instead
  *      (the old behavior) made a seconds span look like microseconds
  *      — a 10⁶× under-width whose only symptom was the maxBins guard
  *      failing at runtime a query that ran fine unrewritten.
  *   2. CONFIG: `spark.graft.rewrite.bandJoin.binWidth` when set.
  *   3. CATALOG STATS: with CBO on and ANALYZE column stats present
  *      for the lo/hi AND point columns, `max(hi) − min(lo)` — an
  *      over-bound of the true max span with ZERO planning-time IO,
  *      accepted only when the point column's stats range spans ≥
  *      `spark.graft.rewrite.bandJoin.statsMinBins` bins at that
  *      width (a degenerate 1–2-bin "equijoin" would be worse than
  *      the nested loop — see [[statsWidth]]).
  *   4. SAMPLED: when `spark.graft.rewrite.bandJoin.sampleWidth` is
  *      true (the default), a bounded sample of the interval side
  *      (`spark.graft.rewrite.bandJoin.sampleRows`, default 4096) is
  *      scanned AT PLANNING TIME for max(hi − lo), which becomes the
  *      width — so the naive band join over stored lo/hi columns (no
  *      structural span, no config) still escapes the nested loop.
  *      One small job per optimization of such a join; max (not a
  *      quantile) because an under-width risks the maxBins guard.
  *
  *   Otherwise the join is left untouched (no derivable width = no
  *   safe rewrite). An interval spanning ≥
  *   `spark.graft.rewrite.bandJoin.maxBins` (default 4096) bins raises
  *   at runtime — the loud misconfiguration guard, same contract as
  *   the library form (reachable on the sampled path only when the
  *   sample missed a ≥4096×-wider-than-max interval).
  *
  * Gated by `spark.graft.rewrite.bandJoin.enabled` (default true).
  * The rule runs inside the operator-optimization fixed point and is
  * idempotent by construction: its own output contains a cross-side
  * equi conjunct, which the matcher rejects.
  */
object BandJoinRewrite extends Rule[LogicalPlan] {

  private val EnabledKey = "spark.graft.rewrite.bandJoin.enabled"
  private val WidthKey = "spark.graft.rewrite.bandJoin.binWidth"
  private val MaxBinsKey = "spark.graft.rewrite.bandJoin.maxBins"
  private val SampleKey = "spark.graft.rewrite.bandJoin.sampleWidth"
  private val SampleRowsKey = "spark.graft.rewrite.bandJoin.sampleRows"
  private val SampleSlackKey = "spark.graft.rewrite.bandJoin.sampleSlack"

  /** One inequality conjunct normalized to "point op bound": `point`'s
    * refs live entirely in one child, `bound`'s entirely in the other. */
  private final case class Band(point: Expression, bound: Expression,
      pointOnLeft: Boolean, isLower: Boolean)

  /** Types whose band comparisons the rewrite understands: integrals
    * bin exactly; timestamps bin on their (monotone) floor-seconds
    * cast, which over-covers but never misses — the exact predicate
    * filters the candidates either way; dates bin on their EXACT
    * days-since-epoch integer (DateType is internally that integer —
    * the single most common band shape in a warehouse is a naive
    * date-range join, and it must not silently plan a nested loop). */
  private def binnable(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType | TimestampType |
        DateType => true
    case _ => false
  }

  private def asLong(e: Expression): Expression = e.dataType match {
    case LongType => e
    // Spark forbids a direct date→numeric cast; UnixDate is the
    // sanctioned days-since-epoch extraction (exact, timezone-free)
    case DateType => Cast(UnixDate(e), LongType)
    case _ => Cast(e, LongType, Some(conf.sessionLocalTimeZone))
  }

  private def normalize(c: BinaryComparison, l: LogicalPlan,
      r: LogicalPlan): Option[Band] = {
    val (a, b) = (c.left, c.right)
    if (!a.deterministic || !b.deterministic) return None
    if (!binnable(a) || !binnable(b)) return None
    def sideOf(e: Expression): Option[Boolean] = {
      val refs = e.references
      if (refs.isEmpty) None
      else if (refs.subsetOf(l.outputSet)) Some(true)
      else if (refs.subsetOf(r.outputSet)) Some(false)
      else None
    }
    (sideOf(a), sideOf(b)) match {
      case (Some(sa), Some(sb)) if sa != sb =>
        c match {
          // a >[=] b : a is an UPPER bound of point b
          case _: GreaterThanOrEqual | _: GreaterThan =>
            Some(Band(point = b, bound = a, pointOnLeft = sb, isLower = false))
          // a <[=] b : b is an UPPER bound of point a
          case _: LessThanOrEqual | _: LessThan =>
            Some(Band(point = a, bound = b, pointOnLeft = sa, isLower = false))
          case _ => None
        }
      case _ => None
    }
  }

  /** Normalize every comparison so the POINT is the bounded expression:
    * emit (point, bound, pointSideIsLeft, lower?) for each conjunct. */
  private def bandsOf(conjuncts: Seq[Expression], l: LogicalPlan,
      r: LogicalPlan): Seq[Band] = conjuncts.flatMap {
    case c: BinaryComparison =>
      normalize(c, l, r).toSeq.flatMap { b =>
        // each inequality bounds BOTH operands; record it from both
        // perspectives so either side can play the point role
        Seq(b, Band(b.bound, b.point, !b.pointOnLeft, !b.isLower))
      }
    case _ => Nil
  }

  /** Trace `e` through the Project/Filter/SubqueryAlias prefix of `p`,
    * inlining aliases, so structurally-derived bounds (`hi = lo + c`)
    * are visible even when both were projected from a shared base. */
  private def dealias(e: Expression, p: LogicalPlan): Expression = p match {
    case Project(projList, child) =>
      val m = projList.collect {
        case a: Alias => a.toAttribute.exprId -> a.child
      }.toMap
      val e2 = e.transformUp {
        case ar: AttributeReference if m.contains(ar.exprId) => m(ar.exprId)
      }
      dealias(e2, child)
    case f: Filter => dealias(e, f.child)
    case s: SubqueryAlias => dealias(e, s.child)
    case _ => e
  }

  /** `hi ≡ lo + c` for a positive constant span after alias inlining →
    * Some(width), already in the point's BINNING unit (see the object
    * doc's width section). Two shapes match:
    *
    *   - an integral `Add(lo, c)` / `Add(c, lo)`: `c` is in the same
    *     unit [[binOf]] compares in — native integral units, or
    *     seconds when the operands are a timestamp's long cast (casting
    *     a timestamp to long yields seconds, the same floor [[asLong]]
    *     bins on);
    *   - `TimestampAddInterval(lo, INTERVAL-literal)` — the shape SQL
    *     `lo + INTERVAL '5' DAY` resolves to on timestamp columns:
    *     the literal carries MICROseconds, scaled to the seconds the
    *     timestamp bins on (floor + min 1: over-wide never misses a
    *     match, the exact predicate filters candidates either way);
    *   - `DateAdd(lo, c)` / `DateAddInterval(lo, CALENDAR-literal)` —
    *     what `date_add(lo, c)` and `lo + INTERVAL 'c' DAY` resolve to
    *     on DATE columns: the span is in DAYS. The unit it scales to
    *     comes from the COMPARISON's type ([[binUnit]]), not the
    *     matched node's — a date arithmetic under a timestamp-coerced
    *     comparison (point is a timestamp, so the analyzer cast the
    *     date bounds up) bins in seconds and needs days × 86400; the
    *     same pure-date shape bins in days and needs the raw count.
    *     The TimestampAddInterval µs lesson, generalized: derive the
    *     span's unit from the matched arithmetic, then scale it to the
    *     unit the comparison bins in. */
  private def structuralSpan(lo: Expression, hi: Expression,
      intervalSide: LogicalPlan): Option[Long] = {
    val loD = dealias(lo, intervalSide)
    val hiD = dealias(hi, intervalSide)
    // the unit binOf/asLong bins this band in, from the comparison's
    // (coerced) type: dates → days; timestamps → seconds (long cast);
    // integrals → their native value
    val binsInDays = lo.dataType == DateType
    val binsInSeconds = lo.dataType == TimestampType
    // days → the binning unit (None when the band bins in a native
    // integral unit — a day count has no meaning there)
    def daysToBinUnit(days: Long): Option[Long] =
      if (binsInDays) Some(math.max(1L, days))
      else if (binsInSeconds) Some(saturatingMul(math.max(1L, days), 86400L))
      else None
    def litOf(e: Expression): Option[Long] = e match {
      case Literal(v: Long, LongType) => Some(v)
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case Literal(v: Short, ShortType) => Some(v.toLong)
      case Literal(v: Byte, ByteType) => Some(v.toLong)
      case Cast(inner, _, _, _) => litOf(inner)
      case _ => None
    }
    def stripCast(e: Expression): Expression = e match {
      case Cast(inner, _, _, _) => stripCast(inner)
      case other => other
    }
    def integral(e: Expression): Boolean = e.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    stripCast(hiD) match {
      case add @ Add(a, b, _) if integral(add) =>
        litOf(b).filter(_ > 0)
          .filter(_ => stripCast(a).semanticEquals(stripCast(loD)))
          .orElse(litOf(a).filter(_ > 0)
            .filter(_ => stripCast(b).semanticEquals(stripCast(loD))))
          .map(math.max(1L, _))
      case TimestampAddInterval(start,
          Literal(micros: Long, _: DayTimeIntervalType), _)
          if micros > 0 && stripCast(start).semanticEquals(stripCast(loD)) =>
        Some(math.max(1L, micros / 1000000L))
      case DateAdd(start, d)
          if stripCast(start).semanticEquals(stripCast(loD)) =>
        litOf(d).filter(_ > 0).flatMap(daysToBinUnit)
      case DateAddInterval(start,
          Literal(ci: CalendarInterval, CalendarIntervalType), _, _)
          // months vary in day length — no constant span to derive
          if ci.months == 0 &&
            stripCast(start).semanticEquals(stripCast(loD)) =>
        // ceil the sub-day microseconds into a whole day: over-wide
        // never misses a match
        val days = ci.days +
          (if (ci.microseconds > 0)
            (ci.microseconds + 86399999999L) / 86400000000L
          else 0L)
        if (days > 0) daysToBinUnit(days) else None
      case _ => None
    }
  }

  /** floorDiv(e, w) in exact long arithmetic (correct for negatives,
    * no floating point) — the IntervalJoin.binE shape as Catalyst. */
  private def binOf(e: Expression, w: Long): Expression = {
    val eL = asLong(e)
    val wL = Literal(w, LongType)
    IntegralDivide(Subtract(eL, Pmod(eL, wL)), wL)
  }

  /** Orientations where exploding the INTERVAL side is safe for the
    * join type (see the object doc's join-type section). */
  private def orientationOk(jt: JoinType, pointOnLeft: Boolean): Boolean =
    jt match {
      case Inner => true
      case LeftSemi | LeftAnti | LeftOuter => pointOnLeft
      case RightOuter => !pointOnLeft
      case _ => false
    }

  private def rewritableType(jt: JoinType): Boolean = jt match {
    case Inner | LeftSemi | LeftAnti | LeftOuter | RightOuter => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(EnabledKey, "true") != "true") return plan
    plan.transformUp {
      case j @ Join(left, right, jt, Some(cond), hint)
          if rewritableType(jt) && cond.deterministic && !j.isStreaming =>
        rewrite(j, left, right, jt, cond, hint).getOrElse(j)
    }
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      jt: JoinType, cond: Expression,
      hint: org.apache.spark.sql.catalyst.plans.logical.JoinHint)
      : Option[LogicalPlan] = {
    val split = splitConjuncts(cond)
    // any cross-side equi conjunct → Spark already plans a hash join;
    // rewriting would only add work (and re-firing on our own output
    // would loop)
    val hasEqui = split.exists {
      case e @ (_: EqualTo | _: EqualNullSafe) =>
        val (a, b) = (e.children(0), e.children(1))
        def crossSide(x: Expression, y: Expression) =
          x.references.nonEmpty && y.references.nonEmpty &&
            x.references.subsetOf(left.outputSet) &&
            y.references.subsetOf(right.outputSet)
        crossSide(a, b) || crossSide(b, a)
      case _ => false
    }
    if (hasEqui) return None
    pointRewrite(j, left, right, jt, cond, split, hint)
      .orElse(if (jt == Inner) // both sides explode: inner-only
        overlapRewrite(j, left, right, cond, split, hint)
      else None)
  }

  /** Covered-bin array `binLo .. binHi` with the loud maxBins guard. */
  private def guardedBins(binLo: Expression, binHi: Expression,
      w: Long): Expression = {
    val maxBins = conf.getConfString(MaxBinsKey, "4096").toLong
    // Sequence is TimeZoneAwareExpression: an undefined timeZoneId
    // leaves it unresolved and trips the optimizer's plan validator
    val seq = Sequence(binLo, binHi, Some(Literal(1L, LongType)),
      Some(conf.sessionLocalTimeZone))
    If(
      LessThan(Subtract(binHi, binLo), Literal(maxBins, LongType)),
      seq,
      Cast(new RaiseError(Literal.create(
        s"BandJoinRewrite: interval spans >= $maxBins bins at " +
          s"binWidth=$w — set $WidthKey nearer the typical span, " +
          s"raise $MaxBinsKey, or disable $SampleKey to fall back " +
          "to the un-rewritten join")), seq.dataType,
        Some(conf.sessionLocalTimeZone)))
  }

  private def pointRewrite(j: Join, left: LogicalPlan,
      right: LogicalPlan, jt: JoinType, cond: Expression,
      split: Seq[Expression],
      hint: org.apache.spark.sql.catalyst.plans.logical.JoinHint)
      : Option[LogicalPlan] = {
    val bands = bandsOf(split, left, right)
    // pick a point expression that carries BOTH a lower and an upper
    // bound from the opposite side, in an orientation the join type
    // admits (the exploded interval side must not be a preserved or
    // output side — see the object doc)
    val candidate = bands
      .filter(b => !b.isLower && orientationOk(jt, b.pointOnLeft))
      .flatMap { up =>
        bands.find(b => b.isLower && b.pointOnLeft == up.pointOnLeft &&
          b.point.semanticEquals(up.point)).map(lo => (up, lo))
      }.headOption
    candidate.flatMap { case (up, lo) =>
      val pointOnLeft = up.pointOnLeft
      val intervalSide = if (pointOnLeft) right else left
      val pointSide = if (pointOnLeft) left else right
      val width = structuralSpan(lo.bound, up.bound, intervalSide)
        .orElse(confWidth())
        .orElse(statsWidth(intervalSide, lo.bound, up.bound,
          pointSide, up.point))
        .orElse(sampledWidth(intervalSide, lo.bound, up.bound))
      width.map { w =>
        // point side: one derived bin column
        val pbinAlias = Alias(binOf(up.point, w), "_gbin_p")()
        val pPlan = Project(pointSide.output :+ pbinAlias, pointSide)
        // interval side: lo <= hi pre-filter (drops null bounds and
        // empty intervals — rows that can match no point under ANY of
        // the admitted join types, so dropping them changes neither
        // the matched set nor which preserved-side rows go unmatched),
        // then explode to covered bins with the loud maxBins guard
        val pre = Filter(LessThanOrEqual(lo.bound, up.bound), intervalSide)
        val gnr = Explode(
          guardedBins(binOf(lo.bound, w), binOf(up.bound, w), w))
        val ibin = AttributeReference("_gbin_i", LongType,
          nullable = gnr.elementSchema.head.nullable)()
        val iPlan = Generate(gnr, unrequiredChildIndex = Nil,
          outer = false, qualifier = None,
          generatorOutput = Seq(ibin), pre)
        val (nl, nr) = if (pointOnLeft) (pPlan, iPlan) else (iPlan, pPlan)
        val newCond = And(cond, EqualTo(pbinAlias.toAttribute, ibin))
        Project(j.output, Join(nl, nr, jt, Some(newCond), hint))
      }
    }
  }

  private val StatsMinBinsKey = "spark.graft.rewrite.bandJoin.statsMinBins"

  /** Catalog-stats width: when ANALYZE column statistics exist for the
    * lo and hi bound COLUMNS (CBO on + `ANALYZE TABLE ... FOR COLUMNS`
    * — propagated to this subplan by Spark's own stats visitors), use
    * `max(hi) − min(lo)` as the width with ZERO planning-time IO — an
    * over-bound of the true max span, so every interval covers ≤ 2
    * bins (assuming the stats reflect the data: STALE stats that
    * under-estimate a later-appended wider interval fail LOUDLY at the
    * runtime maxBins guard naming its knobs, never silently).
    *
    * The over-bound cuts both ways: width = the interval columns'
    * whole joint range, so when the POINTS spread over a similar range
    * the "equijoin" would collapse into 1–2 bins — a skewed
    * pseudo-cross-join WORSE than the nested loop it replaces. The
    * width is therefore accepted only when the point column's OWN
    * stats prove the rewrite non-degenerate:
    * `(max(point) − min(point)) / width ≥ statsMinBins` (default 64).
    * A range-compact interval table (current campaign windows, a
    * recent-partition dimension) against a years-wide point column
    * passes and skips the sampling job entirely; an interval table
    * spanning the whole timeline — where only measuring actual spans
    * can find a useful width — falls through to [[sampledWidth]].
    * Sits BELOW the user's explicit conf and ABOVE sampling. Values
    * are scaled from each column's native unit to the unit the
    * comparison bins in (micros→seconds, days→days-or-seconds),
    * rounding outward so the bound stays a bound. */
  private def statsWidth(intervalSide: LogicalPlan, lo: Expression,
      hi: Expression, pointSide: LogicalPlan, point: Expression)
      : Option[Long] = try {
    if (!conf.cboEnabled) return None
    def attrOf(e: Expression): Option[Attribute] = e match {
      case a: Attribute => Some(a)
      case Cast(inner, _, _, _) => attrOf(inner)
      case _ => None
    }
    // value of a column-stat endpoint (Catalyst-internal repr) in the
    // band's binning unit; roundUp governs the outward direction
    def inBinUnit(v: Any, dt: DataType, roundUp: Boolean): Option[Long] = {
      val binsInDays = lo.dataType == DateType
      val binsInSeconds = lo.dataType == TimestampType
      def div(x: Long, d: Long): Long =
        if (roundUp) Math.addExact(Math.floorDiv(x - 1, d), 1L)
        else Math.floorDiv(x, d)
      dt match {
        case ByteType => Some(v.asInstanceOf[Byte].toLong)
        case ShortType => Some(v.asInstanceOf[Short].toLong)
        case IntegerType if !binsInDays && !binsInSeconds =>
          Some(v.asInstanceOf[Int].toLong)
        case LongType if !binsInDays && !binsInSeconds =>
          Some(v.asInstanceOf[Long])
        case TimestampType if binsInSeconds => // micros → seconds
          Some(div(v.asInstanceOf[Long], 1000000L))
        case DateType if binsInDays => Some(v.asInstanceOf[Int].toLong)
        case DateType if binsInSeconds => // days → seconds, exact
          Some(Math.multiplyExact(v.asInstanceOf[Int].toLong, 86400L))
        case _ => None
      }
    }
    val minBins = conf.getConfString(StatsMinBinsKey, "64").toLong
    for {
      loA <- attrOf(lo)
      hiA <- attrOf(hi)
      pA <- attrOf(point)
      stats = intervalSide.stats
      loS <- stats.attributeStats.get(loA)
      hiS <- stats.attributeStats.get(hiA)
      pStats = pointSide.stats
      pS <- pStats.attributeStats.get(pA)
      mn <- loS.min
      mx <- hiS.max
      pMin <- pS.min
      pMax <- pS.max
      a <- inBinUnit(mn, loA.dataType, roundUp = false)
      b <- inBinUnit(mx, hiA.dataType, roundUp = true)
      if b > a
      // subtractExact: a wrap-around on a sentinel-valued column would
      // yield a tiny width and fail the maxBins guard at runtime —
      // overflow throws instead, and the catch falls back to sampling
      w = math.max(1L, Math.subtractExact(b, a))
      pLo <- inBinUnit(pMin, pA.dataType, roundUp = false)
      pHi <- inBinUnit(pMax, pA.dataType, roundUp = true)
      // degeneracy gate: the points must spread over enough bins for
      // the equijoin to prune — otherwise fall through to sampling
      if Math.subtractExact(pHi, pLo) / w >= minBins
    } yield w
  } catch { case scala.util.control.NonFatal(_) => None }

  // sampled widths memoized on the canonicalized (plan, lo, hi): the
  // optimizer fixed point re-invokes the rule while OTHER rules still
  // change the plan, and explain-then-execute optimizes twice — without
  // the memo each pass would re-run the sampling job. Bounded LRU;
  // width is a plan heuristic, so a stale hit is harmless.
  private val sampleMemo = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[
        (LogicalPlan, Expression, Expression), Option[Long]](
        16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[
            (LogicalPlan, Expression, Expression), Option[Long]]): Boolean =
        size > 64
    })

  /** Only plans whose planning-time execution is a bounded file/local
    * read: leaves plus row-at-a-time unary shapes, so the Limit above
    * really bounds the work. A Join/Aggregate/Window/Sort/Generate
    * upstream would run its WHOLE input before the first row reaches
    * the limit — planning (and every `.explain`) would silently launch
    * that job, so those shapes fall back to no-width (= no rewrite)
    * instead. */
  private def cheapToSample(plan: LogicalPlan): Boolean =
    plan.collectFirst {
      case p if !(p.isInstanceOf[
            org.apache.spark.sql.catalyst.plans.logical.LeafNode] ||
          p.isInstanceOf[Project] ||
          p.isInstanceOf[Filter] ||
          p.isInstanceOf[
            org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias] ||
          p.isInstanceOf[
            org.apache.spark.sql.catalyst.plans.logical.GlobalLimit] ||
          p.isInstanceOf[
            org.apache.spark.sql.catalyst.plans.logical.LocalLimit]) => p
    }.isEmpty

  /** Last-resort width: scan a bounded sample of the interval side at
    * planning time for max(hi − lo) in the binning unit (see the
    * object doc's width section — max, not a quantile, because an
    * under-width risks the runtime maxBins guard), widened by a slack
    * factor (`spark.graft.rewrite.bandJoin.sampleSlack`, default 4):
    * the sample is a bounded PREFIX, not a random draw, so a store
    * sorted by span would otherwise under-estimate — slack absorbs
    * moderate head-vs-tail skew at the cost of coarser bins, and the
    * residual pathological case fails LOUDLY at the maxBins guard
    * naming its knobs. Returns None when sampling is disabled, the
    * subplan is not cheap to execute at planning time
    * ([[cheapToSample]]), the sample is empty, or anything about
    * executing the subplan fails (a planning-time heuristic must never
    * fail the query it is trying to speed up). */
  private def sampledWidth(intervalSide: LogicalPlan, lo: Expression,
      hi: Expression): Option[Long] = {
    if (conf.getConfString(SampleKey, "true") != "true") return None
    if (!cheapToSample(intervalSide)) return None
    val memoKey = (intervalSide.canonicalized, lo.canonicalized,
      hi.canonicalized)
    val hit = sampleMemo.get(memoKey)
    if (hit != null) return hit
    try {
      val n = conf.getConfString(SampleRowsKey, "4096").toInt
      val slack = math.max(1L,
        conf.getConfString(SampleSlackKey, "4").toLong)
      val span = Alias(Subtract(asLong(hi), asLong(lo)), "_gspan")()
      val sample = Limit(Literal(n, IntegerType),
        Project(Seq(span),
          Filter(LessThanOrEqual(lo, hi), intervalSide)))
      val agg = Aggregate(Nil,
        Seq(Alias(Max(span.toAttribute).toAggregateExpression(), "_gmax")()),
        sample)
      val row = org.apache.spark.sql.GraftSqlShims
        .ofRows(SparkSession.active, agg).head()
      // saturate: a huge sampled span (e.g. an open-ended interval
      // encoded with a Long.MaxValue sentinel hi) times the slack would
      // overflow to a NEGATIVE width, which slips past the maxBins
      // guard (negative binHi − binLo) and explodes at Sequence —
      // failing a query that ran fine before the slack factor existed
      val w =
        if (row.isNullAt(0)) None
        else Some(saturatingMul(math.max(1L, row.getLong(0)), slack))
      sampleMemo.put(memoKey, w)
      w
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Two-sided band ("overlap") rewrite: `aLo < bHi AND bLo < aHi`
    * with two bound expressions per side and no equi key — the naive
    * form of [[graft.operators.IntervalJoin.intervalOverlap]]'s shape,
    * which otherwise plans a nested loop. Unlike the library operator
    * (set-intersection semantics: empty intervals match nothing), the
    * NAIVE predicate also matches empty/inverted intervals — so the
    * rewrite normalizes each side to its UNORDERED range
    * (least/greatest) instead of pre-filtering: whenever the predicate
    * holds, the two unordered ranges intersect (if they didn't, one
    * conjunct would be violated — a two-case proof on which range ends
    * first), so the pair shares a bin in the exploded closed ranges.
    * Exactly-once by the canonical-bin trick: a pair is kept only at
    * `greatest(bin(a⁻), bin(b⁻))` = the first shared bin. Width = the
    * smaller of the two sides' structural spans, else the config. */
  private def overlapRewrite(j: Join, left: LogicalPlan,
      right: LogicalPlan, cond: Expression, split: Seq[Expression],
      hint: org.apache.spark.sql.catalyst.plans.logical.JoinHint)
      : Option[LogicalPlan] = {
    // cross-side inequalities as (upperBounded, bound, boundedOnLeft)
    val ineqs = split.flatMap {
      case c: BinaryComparison => normalize(c, left, right)
      case _ => None
    }
    for {
      lUp <- ineqs.find(_.pointOnLeft) // lLo < rHi
      rUp <- ineqs.find(!_.pointOnLeft) // rLo < lHi
      w <- Seq(structuralSpan(lUp.point, rUp.bound, left),
          structuralSpan(rUp.point, lUp.bound, right)).flatten
        .reduceOption(_ min _)
        .orElse(confWidth())
    } yield {
      def sided(plan: LogicalPlan, lo: Expression, hi: Expression,
          lbName: String, binName: String) = {
        val loN = Least(Seq(lo, hi))
        val hiN = Greatest(Seq(lo, hi))
        val lb = Alias(binOf(loN, w), lbName)()
        val proj = Project(plan.output :+ lb, plan)
        val gnr = Explode(guardedBins(binOf(loN, w), binOf(hiN, w), w))
        val bin = AttributeReference(binName, LongType,
          nullable = gnr.elementSchema.head.nullable)()
        (Generate(gnr, unrequiredChildIndex = Nil, outer = false,
          qualifier = None, generatorOutput = Seq(bin), proj),
          lb.toAttribute, bin)
      }
      val (lPlan, albin, abin) =
        sided(left, lUp.point, rUp.bound, "_gbin_al", "_gbin_a")
      val (rPlan, blbin, bbin) =
        sided(right, rUp.point, lUp.bound, "_gbin_bl", "_gbin_b")
      val newCond = And(And(cond, EqualTo(abin, bbin)),
        EqualTo(abin, Greatest(Seq(albin, blbin))))
      Project(j.output, Join(lPlan, rPlan, Inner, Some(newCond), hint))
    }
  }

  /** a·b clamped to Long.MaxValue (both operands positive here). An
    * over-wide width only coarsens bins — it can never miss a match —
    * so saturation is always the safe direction. */
  private def saturatingMul(a: Long, b: Long): Long =
    if (a > Long.MaxValue / b) Long.MaxValue else a * b

  private def confWidth(): Option[Long] =
    scala.util.Try(conf.getConfString(WidthKey, "").toLong)
      .toOption.filter(_ > 0)

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }
}
