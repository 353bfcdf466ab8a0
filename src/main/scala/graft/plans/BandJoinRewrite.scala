package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{
  Add, Alias, And, Attribute, AttributeReference, BinaryComparison, Cast,
  DateAdd, DateAddInterval, EqualNullSafe, EqualTo, Explode, Expression,
  Greatest, GreaterThan, GreaterThanOrEqual, If, IntegralDivide, Least,
  LessThan, LessThanOrEqual, Literal, Pmod, RaiseError, Sequence,
  Subtract, TimestampAddInterval, UnixDate, UnscaledValue}
import org.apache.spark.sql.catalyst.expressions.aggregate.Max
import org.apache.spark.sql.catalyst.plans.{
  Inner, JoinType, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate, Filter, Generate, Join, Limit, LogicalPlan, Project,
  SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{
  ArrayType, ByteType, CalendarIntervalType, DataType, DateType,
  DayTimeIntervalType, Decimal, DecimalType, IntegerType, LongType,
  ShortType, TimestampType}
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
  * BINNING UNIT: bins are computed over an exact long image of the
  * band's value space — integrals as themselves, timestamps as their
  * floor-seconds cast, dates as their exact days-since-epoch integer,
  * and DECIMALS as their unscaled long at the band's WIDEST scale
  * (`DECIMAL(p,s)` is internally `unscaled · 10^-s`; rescaling to the
  * wider scale is exact, and the two comparisons of one band can
  * legitimately coerce to different scales — `x:DEC(10,2) >= lo` vs
  * `x < hi:DEC(14,4)` — so the unit must be chosen per BAND, not per
  * expression). Decimals past precision 18 (after rescaling) don't fit
  * an unscaled long and are skipped, as are doubles (no exact long
  * image). Money-domain bands — the most common DECIMAL shape — bin
  * exactly. All width sources below return widths in this unit.
  *
  * Bin width, in priority order:
  *
  *   1. STRUCTURAL: the interval side's `hi` is provably `lo + c` for
  *      a positive literal `c` (the common derived-window shape — then
  *      every interval covers ≤ 2 bins). The span's unit is the unit
  *      of the matched arithmetic itself: an integral `Add` is already
  *      in the point's binning unit (timestamps bin on their
  *      floor-SECONDS cast, and the only integral adds reachable under
  *      a timestamp comparison are second-typed long arithmetic), a
  *      `ts + INTERVAL` (TimestampAddInterval with a literal
  *      day-time interval) carries MICROseconds, scaled down to
  *      seconds here, and a DECIMAL `Add` carries the literal's own
  *      scale, rescaled (ceiling) to the band's binning scale.
  *      Deriving the unit from the point's type instead (the old
  *      behavior) made a seconds span look like microseconds
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
  *   The TWO-SIDED overlap rewrite ([[overlapRewrite]]) walks the same
  *   ladder: structural spans (min over the sides that have one — a
  *   structural span is a per-row CONSTANT, so the wider side's
  *   explosion is the known constant ratio), the config width,
  *   per-side catalog-stats UNORDERED ranges (min, gated on the wider
  *   side's spread — [[statsOverlapWidth]]; stats bound joint ranges,
  *   not per-row spans, so a wide-side row spanning far beyond the
  *   compact side's range fails LOUDLY at the runtime maxBins guard
  *   naming its knobs), then per-side sampled max spans (MAX of the
  *   two, BOTH sides required — each side's measured spans must fit
  *   the width, or one outlier row against a narrow-span other side
  *   would RaiseError a query the naive plan answered).
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

  /** The exact-long unit a band's bins are computed in (see the object
    * doc's BINNING UNIT section): integrals as themselves, dates in
    * days, timestamps in floor-seconds, decimals as the unscaled long
    * at the band's widest `scale`. */
  private sealed trait BinUnit
  private case object NativeUnit extends BinUnit
  private case object DayUnit extends BinUnit
  private case object SecondUnit extends BinUnit
  private final case class ScaledUnit(scale: Int) extends BinUnit

  private def unitOf(dt: DataType): Option[BinUnit] = dt match {
    case ByteType | ShortType | IntegerType | LongType => Some(NativeUnit)
    case DateType => Some(DayUnit)
    case TimestampType => Some(SecondUnit)
    // > 18 digits has no unscaled long (Decimal128 territory); doubles
    // have no exact long image at all — both stay un-rewritten
    case d: DecimalType if d.precision <= 18 => Some(ScaledUnit(d.scale))
    case _ => None
  }

  /** The ONE unit all of a rewrite's bin expressions share, from the
    * comparison-coerced types of every expression that will be binned.
    * Decimal scales unify to the max (exact — rescaling a decimal UP
    * is value-preserving), re-checked to still fit an unscaled long at
    * that scale; any other mixture (a date-typed lower comparison
    * against a timestamp-typed upper, say) has no common exact unit
    * and rejects the rewrite. */
  private def unitFor(exprs: Seq[Expression]): Option[BinUnit] = {
    val units = exprs.map(e => unitOf(e.dataType))
    if (units.exists(_.isEmpty)) return None
    units.flatten.distinct match {
      case Seq(u) => Some(u)
      case us if us.forall(_.isInstanceOf[ScaledUnit]) =>
        val s = us.map(_.asInstanceOf[ScaledUnit].scale).max
        val fits = exprs.forall { e =>
          val d = e.dataType.asInstanceOf[DecimalType]
          d.precision + (s - d.scale) <= 18
        }
        if (fits) Some(ScaledUnit(s)) else None
      case _ => None
    }
  }

  /** Types whose band comparisons the rewrite understands (the unit
    * table above): integrals bin exactly; timestamps bin on their
    * (monotone) floor-seconds cast, which over-covers but never misses
    * — the exact predicate filters the candidates either way; dates
    * bin on their EXACT days-since-epoch integer; decimals of ≤ 18
    * digits bin exactly on their unscaled long (the money-domain band
    * — a price band on `DECIMAL(p,s)` must not silently plan a nested
    * loop any more than a date range may). */
  private def binnable(e: Expression): Boolean = unitOf(e.dataType).isDefined

  /** Exact long image of `e` in `unit` (see the object doc). For a
    * decimal at a narrower scale than the unit's, the widening rescale
    * cast is exact and [[unitFor]] already proved the result fits. */
  private def asLong(e: Expression, unit: BinUnit): Expression =
    unit match {
      case ScaledUnit(s) =>
        val d = e.dataType.asInstanceOf[DecimalType]
        if (d.scale == s) UnscaledValue(e)
        else UnscaledValue(Cast(e,
          DecimalType(math.min(38, d.precision + (s - d.scale)), s)))
      case _ => e.dataType match {
        case LongType => e
        // Spark forbids a direct date→numeric cast; UnixDate is the
        // sanctioned days-since-epoch extraction (exact, timezone-free)
        case DateType => Cast(UnixDate(e), LongType)
        case _ => Cast(e, LongType, Some(conf.sessionLocalTimeZone))
      }
    }

  /** `e` recast to the unit's common comparison type when the rewrite
    * must CONSTRUCT a comparison/Least/Greatest over two expressions
    * that coerced to different types (`Least(DEC(13,4), DEC(14,4))` —
    * or `Least(BIGINT, INT)` when the two comparisons of an overlap
    * band coerced to different integral widths — would be an
    * unresolved expression: Catalyst requires exact type agreement in
    * optimizer-built nodes). Integrals widen to long (exact), decimals
    * to the band's scale at precision 18 (exact — [[unitFor]] proved
    * the fit); date/timestamp units always share one type already. */
  private def toUnitType(e: Expression, unit: BinUnit): Expression =
    unit match {
      case ScaledUnit(s) if e.dataType != DecimalType(18, s) =>
        Cast(e, DecimalType(18, s))
      case NativeUnit if e.dataType != LongType =>
        Cast(e, LongType)
      case _ => e
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

  /** Strip analyzer-inserted VALUE-PRESERVING casts to decimal: a
    * widening decimal→decimal rescale, or an integral→decimal cast
    * whose integer part provably holds the source's range. The two
    * comparisons of one decimal band coerce the SAME point column to
    * DIFFERENT decimal types (`DEC(13,4)` vs `DEC(14,4)` — see the
    * object doc), so the raw `semanticEquals` pairing would never
    * match; stripping only provably-lossless casts keeps the pairing
    * sound (a lossy cast changes the value, and two different lossy
    * images of one column are NOT the same point). */
  private def stripWideningToDecimal(e: Expression): Expression = e match {
    case Cast(inner, d: DecimalType, _, _) =>
      val lossless = inner.dataType match {
        case s: DecimalType =>
          d.scale >= s.scale &&
            d.precision - d.scale >= s.precision - s.scale
        case ByteType => d.precision - d.scale >= 3
        case ShortType => d.precision - d.scale >= 5
        case IntegerType => d.precision - d.scale >= 10
        case LongType => d.precision - d.scale >= 19
        case _ => false
      }
      if (lossless) stripWideningToDecimal(inner) else e
    case other => other
  }

  /** The same underlying point expression, modulo the per-comparison
    * coercion casts (exact `semanticEquals` for every non-decimal
    * band, whose two comparisons always coerce identically). */
  private def samePoint(a: Expression, b: Expression): Boolean =
    a.semanticEquals(b) ||
      ((a.dataType, b.dataType) match {
        case (_: DecimalType, _: DecimalType) =>
          stripWideningToDecimal(a)
            .semanticEquals(stripWideningToDecimal(b))
        case _ => false
      })

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
    * Some(width), already in the band's BINNING unit (see the object
    * doc's width section). Matched shapes:
    *
    *   - an integral `Add(lo, c)` / `Add(c, lo)`: `c` is in the same
    *     unit [[asLong]] compares in — native integral units, or
    *     seconds when the operands are a timestamp's long cast (casting
    *     a timestamp to long yields seconds, the same floor [[asLong]]
    *     bins on);
    *   - a DECIMAL `Add(lo, c)` / `Add(c, lo)` — what `lo + 0.05`
    *     resolves to on decimal columns: the literal carries its own
    *     scale, rescaled (ceiling — over-wide never misses) to the
    *     band's binning scale;
    *   - `TimestampAddInterval(lo, INTERVAL-literal)` — the shape SQL
    *     `lo + INTERVAL '5' DAY` resolves to on timestamp columns:
    *     the literal carries MICROseconds, scaled to the seconds the
    *     timestamp bins on (floor + min 1: over-wide never misses a
    *     match, the exact predicate filters candidates either way);
    *   - `DateAdd(lo, c)` / `DateAddInterval(lo, CALENDAR-literal)` —
    *     what `date_add(lo, c)` and `lo + INTERVAL 'c' DAY` resolve to
    *     on DATE columns: the span is in DAYS. The unit it scales to
    *     comes from the BAND's unit, not the matched node's — a date
    *     arithmetic under a timestamp-coerced comparison (point is a
    *     timestamp, so the analyzer cast the date bounds up) bins in
    *     seconds and needs days × 86400; the same pure-date shape bins
    *     in days and needs the raw count. The TimestampAddInterval µs
    *     lesson, generalized: derive the span's unit from the matched
    *     arithmetic, then scale it to the unit the band bins in. */
  private def structuralSpan(lo: Expression, hi: Expression,
      intervalSide: LogicalPlan, unit: BinUnit): Option[Long] = {
    val loD = dealias(lo, intervalSide)
    val hiD = dealias(hi, intervalSide)
    // days → the binning unit (None when the band bins in a native
    // integral or decimal unit — a day count has no meaning there)
    def daysToBinUnit(days: Long): Option[Long] = unit match {
      case DayUnit => Some(math.max(1L, days))
      case SecondUnit => Some(saturatingMul(math.max(1L, days), 86400L))
      case _ => None
    }
    def litOf(e: Expression): Option[Long] = e match {
      case Literal(v: Long, LongType) => Some(v)
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case Literal(v: Short, ShortType) => Some(v.toLong)
      case Literal(v: Byte, ByteType) => Some(v.toLong)
      case Cast(inner, _, _, _) => litOf(inner)
      case _ => None
    }
    // a decimal literal's exact value (casts around it are the
    // analyzer's precision adjustments — value-preserving for the
    // literal range the match admits)
    def decLitOf(e: Expression): Option[java.math.BigDecimal] = e match {
      case Literal(v: Decimal, _: DecimalType) => Some(v.toJavaBigDecimal)
      case Cast(inner, _, _, _) => decLitOf(inner)
      case _ => None
    }
    // a positive decimal span in the band's binning unit: unscaled at
    // the unit's scale, CEILING so the bound stays a bound
    def decSpanInUnit(bd: java.math.BigDecimal): Option[Long] = unit match {
      case ScaledUnit(s) => scala.util.Try(
        math.max(1L, bd.movePointRight(s)
          .setScale(0, java.math.RoundingMode.CEILING)
          .longValueExact())).toOption
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
      case add @ Add(a, b, _) if add.dataType.isInstanceOf[DecimalType] =>
        // the money-domain structural window: hi = lo + 0.05. The
        // strip/compare uses the widening-aware form because the two
        // sides' decimal images of `lo` carry different coercion casts
        decLitOf(b).filter(_.signum > 0)
          .filter(_ => stripWideningToDecimal(stripCast(a)).semanticEquals(
            stripWideningToDecimal(stripCast(loD))))
          .orElse(decLitOf(a).filter(_.signum > 0)
            .filter(_ => stripWideningToDecimal(stripCast(b)).semanticEquals(
              stripWideningToDecimal(stripCast(loD)))))
          .flatMap(decSpanInUnit)
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
  private def binOf(e: Expression, w: Long, unit: BinUnit): Expression = {
    val eL = asLong(e, unit)
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
          samePoint(b.point, up.point)).map(lo => (up, lo))
      }.headOption
    candidate.flatMap { case (up, lo) =>
      val pointOnLeft = up.pointOnLeft
      val intervalSide = if (pointOnLeft) right else left
      val pointSide = if (pointOnLeft) left else right
      unitFor(Seq(up.point, up.bound, lo.point, lo.bound)).flatMap { unit =>
        val width = structuralSpan(lo.bound, up.bound, intervalSide, unit)
          .orElse(confWidth())
          .orElse(statsWidth(intervalSide, lo.bound, up.bound,
            pointSide, up.point, unit))
          .orElse(sampledWidth(intervalSide, lo.bound, up.bound, unit))
        width.map { w =>
          // point side: one derived bin column
          val pbinAlias = Alias(binOf(up.point, w, unit), "_gbin_p")()
          val pPlan = Project(pointSide.output :+ pbinAlias, pointSide)
          // interval side: lo <= hi pre-filter (drops null bounds and
          // empty intervals — rows that can match no point under ANY of
          // the admitted join types, so dropping them changes neither
          // the matched set nor which preserved-side rows go unmatched),
          // then explode to covered bins with the loud maxBins guard.
          // toUnitType: the two bounds may carry different (decimal)
          // coercion types — recast to the band's common type so the
          // constructed comparison resolves
          val pre = Filter(LessThanOrEqual(
            toUnitType(lo.bound, unit), toUnitType(up.bound, unit)),
            intervalSide)
          val gnr = Explode(
            guardedBins(binOf(lo.bound, w, unit),
              binOf(up.bound, w, unit), w))
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
  }

  private val StatsMinBinsKey = "spark.graft.rewrite.bandJoin.statsMinBins"

  /** Catalog-stats range of [loE, hiE] over `side`, in the band's
    * binning unit: `max(hi) − min(lo)` when ANALYZE column statistics
    * exist for both bound COLUMNS (CBO on + `ANALYZE TABLE ... FOR
    * COLUMNS` — propagated to this subplan by Spark's own stats
    * visitors), with ZERO planning-time IO. Values are scaled from
    * each column's native unit to the band's (micros→seconds,
    * days→days-or-seconds, decimal→the band's unscaled scale),
    * rounding outward so the bound stays a bound. Pass loE = hiE to
    * read one column's own spread (the degeneracy gates below).
    * Returns the raw difference — callers apply their positivity and
    * degeneracy gates. subtractExact: a wrap-around on a
    * sentinel-valued column would yield a tiny width and fail the
    * maxBins guard at runtime — overflow throws instead, and the
    * catch falls back to sampling. */
  private def statsRange(side: LogicalPlan, loE: Expression,
      hiE: Expression, unit: BinUnit,
      unordered: Boolean = false): Option[Long] = try {
    if (!conf.cboEnabled) return None
    def attrOf(e: Expression): Option[Attribute] = e match {
      case a: Attribute => Some(a)
      case Cast(inner, _, _, _) => attrOf(inner)
      case _ => None
    }
    // value of a column-stat endpoint (Catalyst-internal repr) in the
    // band's binning unit; roundUp governs the outward direction
    def inBinUnit(v: Any, dt: DataType, roundUp: Boolean): Option[Long] = {
      def div(x: Long, d: Long): Long =
        if (roundUp) Math.addExact(Math.floorDiv(x - 1, d), 1L)
        else Math.floorDiv(x, d)
      (unit, dt) match {
        case (NativeUnit, ByteType) => Some(v.asInstanceOf[Byte].toLong)
        case (NativeUnit, ShortType) => Some(v.asInstanceOf[Short].toLong)
        case (NativeUnit, IntegerType) => Some(v.asInstanceOf[Int].toLong)
        case (NativeUnit, LongType) => Some(v.asInstanceOf[Long])
        case (SecondUnit, TimestampType) => // micros → seconds
          Some(div(v.asInstanceOf[Long], 1000000L))
        case (DayUnit, DateType) => Some(v.asInstanceOf[Int].toLong)
        case (SecondUnit, DateType) => // days → seconds, exact
          Some(Math.multiplyExact(v.asInstanceOf[Int].toLong, 86400L))
        case (ScaledUnit(s), _: DecimalType) =>
          // Decimal stats value → unscaled at the band's scale, exact
          // up to the outward rounding; longValueExact throws on
          // overflow into the enclosing catch
          Some(v.asInstanceOf[Decimal].toJavaBigDecimal
            .movePointRight(s)
            .setScale(0, if (roundUp) java.math.RoundingMode.CEILING
              else java.math.RoundingMode.FLOOR)
            .longValueExact())
        case _ => None
      }
    }
    def endpoint(e: Expression, wantMax: Boolean): Option[Long] = for {
      a <- attrOf(e)
      st <- side.stats.attributeStats.get(a)
      v <- if (wantMax) st.max else st.min
      r <- inBinUnit(v, a.dataType, roundUp = wantMax)
    } yield r
    if (unordered)
      // the UNORDERED joint range [min(lo⁻, hi⁻), max(lo⁺, hi⁺)]: the
      // overlap rewrite normalizes each row through least/greatest, so
      // an INVERTED row's true span is bounded only by the two
      // columns' JOINT range — min(lo)..max(hi) alone under-bounds it,
      // and an under-width means the runtime maxBins RaiseError kills
      // a query the naive plan answered
      for {
        a1 <- endpoint(loE, wantMax = false)
        a2 <- endpoint(hiE, wantMax = false)
        b1 <- endpoint(loE, wantMax = true)
        b2 <- endpoint(hiE, wantMax = true)
      } yield Math.subtractExact(math.max(b1, b2), math.min(a1, a2))
    else
      // ordered form (the one-sided point rewrite, whose pre-filter
      // drops inverted rows): every surviving row's span is bounded by
      // max(hi) − min(lo)
      for {
        a <- endpoint(loE, wantMax = false)
        b <- endpoint(hiE, wantMax = true)
      } yield Math.subtractExact(b, a)
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Catalog-stats width for the one-sided point rewrite:
    * `max(hi) − min(lo)` over the interval side — an over-bound of the
    * true max span (assuming the stats reflect the data: STALE stats
    * that under-estimate a later-appended wider interval fail LOUDLY
    * at the runtime maxBins guard naming its knobs, never silently).
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
    * Sits BELOW the user's explicit conf and ABOVE sampling.
    *
    * STALENESS HAZARD, both directions: ANALYZE stats are a snapshot.
    * Intervals appended WIDER after ANALYZE under-estimate the width —
    * caught LOUDLY by the runtime maxBins guard. Points appended over
    * a WIDER range after ANALYZE can't hurt (the true spread only
    * grows past the gate). The silent case is points whose real range
    * SHRANK since ANALYZE (mass deletion): the gate may admit a width
    * the live points collapse into few bins of — a slow skewed join,
    * not a wrong one, and the runtime guard never fires in the
    * too-WIDE direction. `statsMinBins` is the safety margin against
    * exactly that drift: at the default 64, the live spread must
    * shrink 32× below the cataloged one before the join degrades to
    * 1–2 effective bins. Re-ANALYZE after bulk deletes, or raise
    * `statsMinBins` where stats routinely lag the data. */
  private def statsWidth(intervalSide: LogicalPlan, lo: Expression,
      hi: Expression, pointSide: LogicalPlan, point: Expression,
      unit: BinUnit): Option[Long] = {
    val minBins = conf.getConfString(StatsMinBinsKey, "64").toLong
    for {
      r <- statsRange(intervalSide, lo, hi, unit)
      if r > 0
      w = math.max(1L, r)
      spread <- statsRange(pointSide, point, point, unit)
      // degeneracy gate: the points must spread over enough bins for
      // the equijoin to prune — otherwise fall through to sampling
      if spread / w >= minBins
    } yield w
  }

  /** Catalog-stats width for the TWO-SIDED overlap rewrite: each
    * side's own UNORDERED joint range `max(lo⁺, hi⁺) − min(lo⁻, hi⁻)`
    * over-bounds any single interval's least/greatest-normalized span
    * on that side (the naive predicate admits INVERTED intervals, so
    * the ordered `max(hi) − min(lo)` alone would under-bound a
    * sentinel-inverted row and trip the runtime maxBins guard on a
    * query the naive plan answered); the min of the two is the width
    * (the structural-span convention — finer bins cost exploded rows
    * on the wider side but prune candidate pairs harder). Degeneracy
    * gate, two-sided: the WIDER side's range must spread over ≥
    * statsMinBins bins at that width — when both sides blanket the
    * same timeline the "equijoin" collapses into 1–2 bins (the
    * pseudo-cross-join), and only measuring actual spans (sampling)
    * can find a useful width. Same staleness posture as
    * [[statsWidth]]. */
  private def statsOverlapWidth(left: LogicalPlan, aLo: Expression,
      aHi: Expression, right: LogicalPlan, bLo: Expression,
      bHi: Expression, unit: BinUnit): Option[Long] = {
    val minBins = conf.getConfString(StatsMinBinsKey, "64").toLong
    for {
      ra <- statsRange(left, aLo, aHi, unit, unordered = true)
      if ra > 0
      rb <- statsRange(right, bLo, bHi, unit, unordered = true)
      if rb > 0
      w = math.max(1L, math.min(ra, rb))
      if math.max(ra, rb) / w >= minBins
    } yield w
  }

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
      hi: Expression, unit: BinUnit): Option[Long] = {
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
      val span = Alias(Subtract(asLong(hi, unit), asLong(lo, unit)),
        "_gspan")()
      val sample = Limit(Literal(n, IntegerType),
        Project(Seq(span),
          Filter(LessThanOrEqual(
            toUnitType(lo, unit), toUnitType(hi, unit)), intervalSide)))
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
    * `greatest(bin(a⁻), bin(b⁻))` = the first shared bin.
    *
    * Width: the full [[BandJoinRewrite]] ladder, two-sided — the min
    * of the sides' structural spans; the config; per-side catalog
    * stats ([[statsOverlapWidth]], zero planning IO); per-side sampled
    * max spans over each side's UNORDERED (least/greatest) range, min
    * of the two with BOTH required — a width blind to one side's spans
    * could trip that side's runtime maxBins guard on data the sampled
    * side never saw. Before round 16 only structural/config existed,
    * so a naive overlap join over STORED lo/hi columns silently
    * planned the nested loop — the exact gap class the date fix closed
    * for one-sided bands, one pattern over. */
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
      unit <- unitFor(Seq(lUp.point, lUp.bound, rUp.point, rUp.bound))
      // each side's unordered range, recast to the band's common type
      // (decimal coercion can type the four bounds differently — a
      // constructed Least over mismatched types would not resolve)
      aLo = toUnitType(lUp.point, unit)
      aHi = toUnitType(rUp.bound, unit)
      bLo = toUnitType(rUp.point, unit)
      bHi = toUnitType(lUp.bound, unit)
      w <- Seq(structuralSpan(lUp.point, rUp.bound, left, unit),
          structuralSpan(rUp.point, lUp.bound, right, unit)).flatten
        .reduceOption(_ min _)
        .orElse(confWidth())
        .orElse(statsOverlapWidth(left, lUp.point, rUp.bound,
          right, rUp.point, lUp.bound, unit))
        .orElse(for {
          wa <- sampledWidth(left, Least(Seq(aLo, aHi)),
            Greatest(Seq(aLo, aHi)), unit)
          wb <- sampledWidth(right, Least(Seq(bLo, bHi)),
            Greatest(Seq(bLo, bHi)), unit)
          // MAX, not min: both sides explode, so the width must cover
          // EACH side's sampled max span or the wider side's rows trip
          // the runtime maxBins RaiseError — one inverted/outlier row
          // against a narrow-span other side would fail a query the
          // naive plan answered (min would bin finer, but robustness
          // beats selectivity: coarser bins only cost candidate pairs)
        } yield math.max(wa, wb))
    } yield {
      def sided(plan: LogicalPlan, lo: Expression, hi: Expression,
          lbName: String, binName: String) = {
        val loN = Least(Seq(lo, hi))
        val hiN = Greatest(Seq(lo, hi))
        val lb = Alias(binOf(loN, w, unit), lbName)()
        val proj = Project(plan.output :+ lb, plan)
        val gnr = Explode(guardedBins(binOf(loN, w, unit),
          binOf(hiN, w, unit), w))
        val bin = AttributeReference(binName, LongType,
          nullable = gnr.elementSchema.head.nullable)()
        (Generate(gnr, unrequiredChildIndex = Nil, outer = false,
          qualifier = None, generatorOutput = Seq(bin), proj),
          lb.toAttribute, bin)
      }
      val (lPlan, albin, abin) = sided(left, aLo, aHi, "_gbin_al", "_gbin_a")
      val (rPlan, blbin, bbin) = sided(right, bLo, bHi, "_gbin_bl", "_gbin_b")
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
