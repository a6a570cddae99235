package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._

/** MATERIALIZED-VIEW MATCHING for the revenue rollup — the §4.2 Rule
  * seam applied to the oldest warehouse trick there is: answer an
  * aggregate from a pre-aggregated table instead of the fact scan.
  *
  * The rewrite: an Aggregate of the canonical revenue report shape —
  *
  *   lineitem
  *     [.filter(l_shipdate >= LO && l_shipdate < HI)]   // optional
  *     .groupBy(l_returnflag)
  *     .agg(sum((l_extendedprice * (1.0 - l_discount)).cast(DEC(18,4))),
  *          count(1))
  *
  * — is redirected onto the day-grain rollup table
  * `Warehouse.writeDailyRevenueRollup` maintains (day, l_returnflag,
  * rev DECIMAL(28,4), cnt BIGINT): SUM(rev) re-aggregates the daily
  * partials (decimal sums are associative, so the answer is
  * BIT-IDENTICAL — the q336 oracle computes from RAW lineitem and the
  * hash must still match) and SUM(cnt) replaces COUNT(1). At 100 TB
  * this is the difference between scanning the fact table and scanning
  * |days|×|flags| rows — the rollup is maintained incrementally by the
  * ingest path (q151's agg-state discipline), and every dashboard
  * query rides it for free, through the OPTIMIZER, with no query
  * rewrite by the user.
  *
  * Soundness gates (each declines to the original plan):
  *  - the scan must be THE parquet source the rollup was built from
  *    (conf `spark.graft.rollup.daily.source`; the rollup path itself
  *    comes from `spark.graft.rollup.daily.path` — both unset ⇒ the
  *    rule is inert);
  *  - filter bounds must be MIDNIGHT-ALIGNED timestamp literals (the
  *    rollup is day-grain: an intra-day bound cannot be answered from
  *    it — the classic MV-matching limitation, honestly declined);
  *  - the aggregate list must be exactly the canonical shape (any
  *    other function, expression form, or grouping key declines —
  *    conservative, like RewriteDotProduct / RewriteGroupedTopK);
  *  - intervening Projects must be pure column selections.
  *
  * Output attributes keep the ORIGINAL names, exprIds, and dataTypes
  * (rev is stored DECIMAL(28,4); the rewritten SUM widens to (38,4)
  * and is cast back down, re-deriving the original DECIMAL(28,4)
  * output type exactly), so parent plan nodes
  * resolve untouched. MvRewriteSpec pins: the rewritten plan scans
  * the rollup; misaligned bounds / foreign aggregates / unset conf
  * decline; results are identical either way. */
object RewriteAggOnRollup extends Rule[LogicalPlan] {

  private val DayMicros = 86400000000L

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val path = conf.getConfString("spark.graft.rollup.daily.path", "")
    val source = conf.getConfString("spark.graft.rollup.daily.source", "")
    if (path.isEmpty || source.isEmpty) return plan
    plan.transform {
      case agg: Aggregate =>
        rewrite(agg, path, source).getOrElse(agg)
    }
  }

  private def rewrite(agg: Aggregate, path: String,
                      source: String): Option[LogicalPlan] = {
    // 1. grouping must be exactly [l_returnflag]
    val rf = agg.groupingExpressions match {
      case Seq(a: AttributeReference) if a.name == "l_returnflag" => a
      case _ => return None
    }
    // 2. walk pure-projection nodes down to [Filter] over the source scan
    var node = agg.child
    while (node.isInstanceOf[Project] &&
        node.asInstanceOf[Project].projectList
          .forall(_.isInstanceOf[AttributeReference]))
      node = node.asInstanceOf[Project].child
    val (bounds, base) = node match {
      case Filter(cond, child) => (Some(cond), child)
      case other => (None, other)
    }
    var scan = base
    while (scan.isInstanceOf[Project] &&
        scan.asInstanceOf[Project].projectList
          .forall(_.isInstanceOf[AttributeReference]))
      scan = scan.asInstanceOf[Project].child
    if (!isSourceScan(scan, source)) return None
    // 3. optional filter: day-aligned [lo, hi) on l_shipdate. The
    //    condition is split into conjuncts because the optimizer has
    //    already run InferFiltersFromConstraints by the time extra
    //    rules fire — an IsNotNull(l_shipdate) rides along and must
    //    not scare the matcher off; any OTHER conjunct declines.
    val range: Option[(Literal, Literal)] = bounds match {
      case None => None
      case Some(cond) =>
        def conjuncts(e: Expression): Seq[Expression] = e match {
          case And(a, b) => conjuncts(a) ++ conjuncts(b)
          case other => Seq(other)
        }
        var lo: Option[Literal] = None
        var hi: Option[Literal] = None
        conjuncts(cond).foreach {
          case IsNotNull(a: AttributeReference) if a.name == "l_shipdate" =>
          case GreaterThanOrEqual(a: AttributeReference, l: Literal)
              if a.name == "l_shipdate" && dayAligned(l) && lo.isEmpty =>
            lo = Some(l)
          case LessThan(a: AttributeReference, l: Literal)
              if a.name == "l_shipdate" && dayAligned(l) && hi.isEmpty =>
            hi = Some(l)
          case _ => return None
        }
        (lo, hi) match {
          case (Some(l), Some(h)) => Some((l, h))
          case _ => return None
        }
    }
    // 4. aggregate list: [rf, alias(sum(cast(price*(1.0-disc) as
    //    dec(18,4)))), alias(count(1))]
    val (revAlias, cntAlias) = agg.aggregateExpressions match {
      case Seq(g: AttributeReference, r: Alias, c: Alias)
          if g.exprId == rf.exprId &&
            isCanonicalRevenueSum(r.child) && isCountStar(c.child) =>
        (r, c)
      case _ => return None
    }
    // 5. fresh instance of the rollup relation
    val rel = rollupRelation(path).getOrElse(return None)
    def attrO(n: String): Option[AttributeReference] =
      rel.output.collectFirst {
        case a: AttributeReference if a.name == n => a
      }
    (attrO("day"), attrO("l_returnflag"), attrO("rev"), attrO("cnt")) match {
      case (Some(day), Some(rr), Some(rev), Some(cnt))
          if rev.dataType == DecimalType(28, 4) &&
            cnt.dataType == LongType && rr.dataType == rf.dataType &&
            // a type-mismatched comparison would UNRESOLVE the plan —
            // the day column must carry the literals' exact type
            range.forall(r => day.dataType == r._1.dataType) =>
        // 6. assemble, preserving output names + exprIds + dataTypes
        val child = range match {
          case Some((lo, hi)) =>
            Filter(And(GreaterThanOrEqual(day, lo), LessThan(day, hi)), rel)
          case None => rel
        }
        // rev is stored DECIMAL(28,4) (never downcast — overflow would
        // NULL and SUM would silently skip it); SUM widens to (38,4),
        // so cast back to the ORIGINAL aggregate's (28,4) output type —
        // exact, since the true total fits (28,4) by construction
        val newAggs: Seq[NamedExpression] = Seq(
          Alias(rr, rf.name)(exprId = rf.exprId),
          Alias(Cast(Sum(rev).toAggregateExpression(), DecimalType(28, 4)),
            revAlias.name)(exprId = revAlias.exprId),
          Alias(Sum(cnt).toAggregateExpression(), cntAlias.name)(
            exprId = cntAlias.exprId))
        Some(Aggregate(Seq(rr), newAggs, child))
      case _ => None
    }
  }

  private def dayAligned(l: Literal): Boolean = (l.dataType, l.value) match {
    case (TimestampNTZType | TimestampType, us: java.lang.Long) =>
      us % DayMicros == 0
    case _ => false
  }

  /** The fact scan must be EXACTLY the configured source: normalized
    * absolute-path equality, not a suffix match — a short/relative
    * conf value (e.g. bare "lineitem.parquet") would suffix-match any
    * fixture's lineitem scan and silently rewrite an aggregate over
    * the wrong table's data. Misconfiguration now DECLINES. (r15, ADVICE) */
  private def isSourceScan(plan: LogicalPlan, source: String): Boolean =
    plan match {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          val hc = fs.sparkSession.sessionState.newHadoopConf()
          val srcPath = new org.apache.hadoop.fs.Path(source)
          val srcQualified =
            try srcPath.getFileSystem(hc).makeQualified(srcPath)
            catch { case _: Throwable => return false }
          fs.location.rootPaths.exists { rp =>
            try rp.getFileSystem(hc).makeQualified(rp) == srcQualified
            catch { case _: Throwable => false }
          }
        case _ => false
      }
      case _ => false
    }

  /** sum(cast(l_extendedprice * (1.0 - l_discount) as decimal(18,4))) */
  private def isCanonicalRevenueSum(e: Expression): Boolean = e match {
    case AggregateExpression(Sum(c: Cast, _), Complete, false, None, _)
        if c.dataType == DecimalType(18, 4) =>
      c.child match {
        case Multiply(p: AttributeReference,
            Subtract(Literal(1.0, DoubleType), d: AttributeReference, _), _) =>
          p.name == "l_extendedprice" && d.name == "l_discount"
        case _ => false
      }
    case _ => false
  }

  private def isCountStar(e: Expression): Boolean = e match {
    case AggregateExpression(Count(Seq(Literal(1, _))), Complete, false,
        None, _) => true
    case _ => false
  }

  /** A FRESH instance of the rollup's analyzed relation per rewrite
    * (newInstance re-ids the attributes — two rewrites in one plan, or
    * across queries, must not share exprIds). */
  private def rollupRelation(path: String): Option[LogicalPlan] = {
    try {
      val analyzed = SparkSession.active.read.parquet(path)
        .queryExecution.analyzed
      analyzed match {
        case lr: LogicalRelation => Some(lr.newInstance())
        case _ => None
      }
    } catch { case _: Throwable => None }
  }
}
