package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 for the reference's ingest surface (R1/R2:
  * per-category REST fetch — reference mercadolibre_pipeline_dag
  * .py:18-33). The reference fetches categories SERIALLY in one
  * process — its scalability ceiling; here each category is an
  * InputPartition, so fetches run one-per-task across the cluster and
  * scale with executors, not driver patience.
  *
  * The HTTP call itself is a clearly-marked deterministic STUB (this
  * container has no egress): payload bytes are synthesized per
  * (category, page) with a seeded generator. Everything AROUND the
  * stub — the provider/table/scan plumbing, the partition-per-category
  * parallelism, option handling, the (category, page, payload) row
  * shape that Ingest.normalize consumes — is the real contract, and a
  * real `http.get` drops into `ApiPartitionReader.fetch` without
  * touching any of it.
  *
  * Usage:
  *   spark.read.format("graft-api")
  *     .option("categories", "MLA1,MLA2").option("pages", "2").load()
  */
class ApiSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-api"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ApiSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new ApiTable(new CaseInsensitiveStringMap(properties))
}

object ApiSource {
  /** One row per fetched page: where it came from + the raw JSON
    * payload (R2 keeps only the body; parsing is Ingest.normalize's
    * job — source and parser stay independently testable). */
  val schema: StructType = StructType(Seq(
    StructField("category", StringType, nullable = false),
    StructField("page", IntegerType, nullable = false),
    StructField("payload", StringType, nullable = false)))
}

class ApiTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = "graft_api"
  override def schema(): StructType = ApiSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder = {
    val categories = Option(options.get("categories"))
      .getOrElse(throw new IllegalArgumentException(
        "graft-api requires option 'categories' (comma-separated)"))
      .split(",").map(_.trim).filter(_.nonEmpty)
    val pages = Option(options.get("pages")).map(_.toInt).getOrElse(1)
    new ApiScanBuilder(categories, pages)
  }
}

/** ScanBuilder with the two pushdowns a remote source MUST implement
  * at scale (r13 — previously the builder fetched everything and let
  * Spark filter after the fact):
  *
  *  - `SupportsPushDownFilters`: EqualTo/In on `category` PRUNES
  *    InputPartitions — a filtered-out category is never fetched at
  *    all (the network-source analog of parquet partition pruning;
  *    with a 10k-category catalog and a 3-category query, 9,997 HTTP
  *    fetches simply don't happen). V2 contract: filters RETURNED
  *    from `pushFilters` (the residual) are evaluated by Spark;
  *    filters reported via `pushedFilters` are the source's
  *    responsibility — and partition pruning satisfies them exactly
  *    (every emitted row's category ∈ the accepted set). Anything
  *    else (page predicates, payload LIKEs) stays residual —
  *    correctness never depends on the source understanding a
  *    predicate.
  *  - `SupportsPushDownRequiredColumns`: column pruning — a query
  *    projecting (category, page) never synthesizes (or, for a real
  *    API, never downloads/decodes) the payload body. The reader
  *    emits rows in the PRUNED schema's column order.
  *  - `SupportsPushDownAggregates` (r14): COUNT(*) / MIN(page) /
  *    MAX(page), optionally grouped by category, are answered from
  *    the source's OWN metadata (a category partition knows its page
  *    range without fetching anything — the API analog of a COUNT
  *    endpoint / parquet footer stats): each surviving partition
  *    emits ONE pre-aggregated row and the fetch counter stays at
  *    zero. PARTIAL pushdown by contract (supportCompletePushDown
  *    stays false): Spark's final aggregate merges the per-partition
  *    partials, so correctness never depends on partition count.
  *    Anything else (SUM, AVG, aggregates over payload) is declined
  *    and the scan falls back to row emission.
  *
  * ApiSourceSpec pins all three: planned-partition count under a
  * category filter, row correctness for residuals, that the pruned
  * scan never materializes payloads, and that pushed aggregates
  * fetch nothing (the fetch counter). */
class ApiScanBuilder(categories: Array[String], pages: Int)
    extends ScanBuilder with Scan with Batch
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates with SupportsRuntimeV2Filtering
    with SupportsPushDownLimit with SupportsPushDownTopN {
  import org.apache.spark.sql.sources.{EqualTo, Filter, In, IsNotNull}

  private var kept: Array[String] = categories
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = ApiSource.schema
  // (groupByCategory, aggregate kinds in pushed order) once accepted
  private var aggPushed: Option[(Boolean, Seq[String])] = None
  // pushed LIMIT / top-N: each partition emits at most `limitN` rows,
  // walking pages descending when `reverseOrder` (top-N on page DESC).
  // PARTIAL pushdown by contract (isPartiallyPushed stays true): Spark
  // re-applies the global limit/sort over the per-partition prefixes,
  // so correctness never depends on partition count — the source's
  // job is only to stop FETCHING past what can possibly survive
  // (limit 3 over a 10k-page category is 3 fetches, not 10k).
  private var limitN: Option[Int] = None
  private var reverseOrder: Boolean = false

  // both pushdown traits declare the same default — Scala requires an
  // explicit override to disambiguate; PARTIAL is the contract here
  override def isPartiallyPushed(): Boolean = true

  override def pushLimit(limit: Int): Boolean = {
    limitN = Some(limit)
    true
  }

  override def pushTopN(
      orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
      limit: Int): Boolean = {
    import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection}
    orders match {
      case Array(o) => o.expression() match {
        case r: NamedReference if r.fieldNames.sameElements(Array("page")) =>
          limitN = Some(limit)
          reverseOrder = o.direction() == SortDirection.DESCENDING
          true
        // any other key: the source has no order to offer — decline
        case _ => false
      }
      case _ => false
    }
  }

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = {
    import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
    def singleCol(
        e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case f: org.apache.spark.sql.connector.expressions.NamedReference
          if f.fieldNames.length == 1 => Some(f.fieldNames.head)
      case _ => None
    }
    val groupOk = agg.groupByExpressions.forall(e =>
      singleCol(e).contains("category"))
    val kinds = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some("count_star")
      case m: Min if singleCol(m.column).contains("page") => Some("min_page")
      case m: Max if singleCol(m.column).contains("page") => Some("max_page")
      case _ => None
    }
    // pages <= 0: every partition is empty, so the pushed-partial
    // protocol would emit ZERO partial rows and Spark's final
    // COUNT-as-SUM-of-partials merge yields NULL, not 0 (no-group-by
    // case). Decline pushdown entirely — the row-emitting path
    // produces zero rows and Spark computes the correct count(*)=0 /
    // empty-group result itself. (r15, ADVICE)
    if (!groupOk || kinds.exists(_.isEmpty) || kinds.isEmpty || pages <= 0)
      false
    else {
      aggPushed = Some((agg.groupByExpressions.nonEmpty, kinds.flatten))
      true
    }
  }

  // RUNTIME filtering (r14 — the third leg of the pushdown story:
  // static filters prune at plan time, aggregates at scan time, and
  // this prunes from JOIN results at RUN time): when this scan sits on
  // the probe side of a join on `category` and the build side
  // materializes first (broadcast/DPP), Spark hands the observed key
  // set as an IN predicate and the doomed categories are never
  // fetched — dynamic partition pruning for a network source. V2
  // contract: filter() runs AFTER build()/toBatch, BEFORE
  // planInputPartitions() on the executed scan; predicates we don't
  // understand are ignored (they only ever REDUCE, never define,
  // correctness — Spark re-applies the join itself).
  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column("category"))

  override def filter(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Unit = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    predicates.foreach { p =>
      if (p.name() == "IN") {
        val children = p.children()
        val onCategory = children.headOption.exists {
          case r: NamedReference => r.fieldNames.sameElements(Array("category"))
          case _ => false
        }
        if (onCategory) {
          val vals: Set[String] = children.drop(1).collect {
            case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
              l.value match {
                case u: UTF8String => u.toString
                case s: String => s
                case other => String.valueOf(other)
              }
          }.toSet
          // an IN with no extractable literals prunes nothing (safe)
          if (vals.nonEmpty) kept = kept.filter(vals)
        }
      }
    }
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case EqualTo("category", _: String) => true
      case In("category", vs) if vs.forall(_.isInstanceOf[String]) => true
      case IsNotNull("category") => true // schema is non-null: vacuous
      case _ => false
    }
    accepted.foreach {
      case EqualTo("category", v: String) => kept = kept.filter(_ == v)
      case In("category", vs) =>
        val set = vs.collect { case s: String => s }.toSet
        kept = kept.filter(set)
      case _ => ()
    }
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    // Spark hands the projection-ordered subset; empty (count(*)-style
    // scans) keeps zero columns — the reader then emits empty rows.
    required = requiredSchema

  override def build(): Scan = this
  // V2 aggregate-pushdown contract: once accepted, the scan's schema
  // is [group cols..., aggregate cols...] in pushed order; Spark's
  // final aggregate merges these partials (SUM over counts, MIN/MAX
  // over the extremes).
  override def readSchema(): StructType = aggPushed match {
    case Some((byCat, kinds)) =>
      val g = if (byCat)
        Seq(StructField("category", StringType, nullable = false)) else Nil
      StructType(g ++ kinds.map {
        case "count_star" => StructField("count_star", LongType, nullable = false)
        case "min_page" => StructField("min_page", IntegerType, nullable = false)
        case "max_page" => StructField("max_page", IntegerType, nullable = false)
      })
    case None => required
  }
  override def description(): String =
    s"graft-api categories=[${kept.mkString(",")}] " +
      s"columns=[${required.fieldNames.mkString(",")}]" +
      aggPushed.map { case (byCat, kinds) =>
        s" pushedAggregates=[${kinds.mkString(",")}]" +
          (if (byCat) " groupBy=[category]" else "")
      }.getOrElse("") +
      limitN.map(n =>
        s" pushedLimit=$n" + (if (reverseOrder) " pageOrder=DESC" else ""))
        .getOrElse("")
  override def toBatch: Batch = this
  // THE scale decision: one partition per SURVIVING category — the
  // reference's serial loop, parallelized AND pruned. (A real API
  // source would also split hot categories by page range.)
  override def planInputPartitions(): Array[InputPartition] =
    kept.map(c => ApiInputPartition(c, pages, required.fieldNames,
      aggPushed.map(_._1).getOrElse(false),
      aggPushed.map(_._2.toArray).getOrElse(Array.empty),
      limitN.getOrElse(-1), reverseOrder): InputPartition)
  override def createReaderFactory(): PartitionReaderFactory =
    new ApiReaderFactory
}

case class ApiInputPartition(category: String, pages: Int,
                             columns: Array[String],
                             aggByCategory: Boolean = false,
                             aggKinds: Array[String] = Array.empty,
                             limit: Int = -1,
                             reverse: Boolean = false)
    extends InputPartition

class ApiReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new ApiPartitionReader(p.asInstanceOf[ApiInputPartition])
}

object ApiPartitionReader {
  /** Test hook: fetches performed by this JVM (the pruning claims are
    * "the fetch never happens" — a counter is the honest witness). */
  val fetchCount = new java.util.concurrent.atomic.AtomicLong
}

class ApiPartitionReader(part: ApiInputPartition)
    extends PartitionReader[InternalRow] {
  private var emitted = 0
  private var current: InternalRow = _
  // pushed limit/top-N: emit at most `limit` rows, walking the page
  // range descending under a pushed `page DESC` top-N — fetches past
  // the cap never happen (the counter witnesses it)
  private val maxRows =
    if (part.limit >= 0) math.min(part.limit, math.max(part.pages, 0))
    else math.max(part.pages, 0)
  private def pageAt(i: Int): Int =
    if (part.reverse) part.pages - 1 - i else i

  /** STUB of the HTTP GET (no egress in this container): synthesizes a
    * deterministic search-response payload for (category, page) in the
    * reference's shape — {"results":[{product}...]}. A real reader
    * replaces this body with the network call and keeps the signature. */
  private def fetch(category: String, page: Int): String = {
    ApiPartitionReader.fetchCount.incrementAndGet()
    val rnd = new scala.util.Random(category.hashCode.toLong * 31 + page)
    val items = (0 until 3).map { i =>
      val id = s"${category}P$page$i"
      val price = math.round(rnd.nextDouble() * 10000) / 100.0
      val qty = rnd.nextInt(100000)
      s"""{"id":"$id","site_id":"MLA","title":"item $id","price":$price,""" +
        s""""sold_quantity":$qty,"thumbnail":"http://img/$id"}"""
    }
    items.mkString("""{"results":[""", ",", "]}")
  }

  // Pushed-aggregate path: ONE partial row per partition, computed
  // from the partition's own metadata (page range) — the fetch stub
  // is never called, which ApiSourceSpec witnesses via the counter.
  // pages <= 0 emits nothing — defensive only: pushAggregation now
  // DECLINES when pages <= 0 (an all-empty scan with a pushed
  // no-group-by COUNT would merge zero partials into NULL, not 0),
  // so this branch is unreachable through the planned path.
  private var aggEmitted = false

  override def next(): Boolean =
    if (part.aggKinds.nonEmpty) {
      if (aggEmitted || part.pages <= 0) false
      else {
        val g: Seq[Any] =
          if (part.aggByCategory) Seq(UTF8String.fromString(part.category))
          else Nil
        // each branch annotated Any: Scala's numeric-literal
        // harmonization would otherwise unify the match to Long and
        // box the INT page partials as java.lang.Long — a
        // ClassCastException in the final aggregate's getInt
        val aggVals: Seq[Any] = part.aggKinds.toSeq.map {
          case "count_star" => (part.pages.toLong: Any)
          case "min_page" => (0: Any)
          case "max_page" => ((part.pages - 1): Any)
        }
        current = InternalRow(g ++ aggVals: _*)
        aggEmitted = true
        true
      }
    } else if (emitted >= maxRows) false
    else {
      // emit only the pruned columns, in the pruned schema's order —
      // the payload is synthesized/downloaded ONLY when projected
      val pg = pageAt(emitted)
      current = InternalRow(part.columns.map {
        case "category" => UTF8String.fromString(part.category)
        case "page" => pg
        case "payload" => UTF8String.fromString(fetch(part.category, pg))
      }.toIndexedSeq: _*)
      emitted += 1
      true
    }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
