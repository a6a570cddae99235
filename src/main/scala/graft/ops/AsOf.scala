package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins — the point-in-time lookups (backward: each left row
  * matched to the LATEST right row with right.ts <= left.ts on the
  * same key; forward: the EARLIEST right row with right.ts >= left.ts)
  * that Spark has no built-in operator for. The mandate's
  * custom-operator preference order applies: this is case (a),
  * composition of existing operators — no custom plan node needed.
  *
  * Implementation is the union + running-last trick, NOT a range
  * self-join:
  *
  *   1. tag right rows side=0 carrying their payload, left rows side=1
  *      with a null payload slot;
  *   2. union and run `last(payload, ignoreNulls) over (partition by
  *      key order by ts, side rows unbounded preceding..current)`:
  *      at a left row the running last is exactly the newest right
  *      payload with right.ts <= left.ts (side 0 sorts before 1, so a
  *      tie on ts matches — DuckDB ASOF `ON r.ts <= l.ts` semantics);
  *   3. keep side=1 rows, project left columns + the matched payload.
  *
  * Scale shape: ONE shuffle on the key (same envelope as a groupBy),
  * state is a single payload per partition-in-flight — vs the
  * range-condition join Spark would otherwise plan (per-key cross
  * product filtered after the fact). Unmatched left rows keep a null
  * payload (left-outer semantics, `ASOF LEFT JOIN`).
  *
  * Determinism: right rows tied on (key, ts) are ordered by payload
  * struct before `last` picks one (greatest payload wins) — callers
  * with possibly-duplicated (key, ts) right rows get a deterministic
  * result as long as `valueCols` are orderable types. */
object AsOf {

  /** @param valueCols right columns to attach; they appear in the
    *                  output as `prefix + name` (left columns are
    *                  never shadowed). */
  def asofBackward(left: DataFrame, right: DataFrame,
                   keyCol: String, tsCol: String,
                   valueCols: Seq[String], prefix: String = "asof_"): DataFrame =
    asofImpl(left, right, keyCol, tsCol, valueCols, prefix, forward = false)

  /** Forward as-of join: each left row matched to the EARLIEST right
    * row with right.ts >= left.ts on the same key (the "next event
    * after" lookup — next maintenance after a failure, next purchase
    * after a click). Same union + running-last composition scanned in
    * DESCENDING timestamp order: at a left row the running last is the
    * latest-scanned right row, i.e. the smallest right.ts >= left.ts.
    * Ties on ts match (DuckDB ASOF `ON r.ts >= l.ts` semantics); same
    * one-key-shuffle scale shape and null semantics as backward. */
  def asofForward(left: DataFrame, right: DataFrame,
                  keyCol: String, tsCol: String,
                  valueCols: Seq[String], prefix: String = "asof_"): DataFrame =
    asofImpl(left, right, keyCol, tsCol, valueCols, prefix, forward = true)

  private def asofImpl(left: DataFrame, right: DataFrame,
                       keyCol: String, tsCol: String, valueCols: Seq[String],
                       prefix: String, forward: Boolean): DataFrame = {
    require(valueCols.nonEmpty, "valueCols must name at least one right column")
    val internal = Set("__rpay", "__side", "__match")
    val outputs = valueCols.map(prefix + _).toSet
    val collisions = left.columns.toSet & (internal ++ outputs)
    require(collisions.isEmpty,
      s"left columns collide with as-of internals/outputs: ${collisions.mkString(", ")}")
    // SQL join-equality semantics: a null key or null ts on the right
    // matches NOTHING (`l.key = r.key AND r.ts <= l.ts` is never true
    // for nulls) — but Window.partitionBy groups nulls together, so
    // unfiltered null-key right rows would "match" null-key left rows.
    // Null-key/ts LEFT rows need no filter: their running last sees no
    // (filtered) right row and yields the correct null payload.
    val r = right
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(
        col(keyCol), col(tsCol),
        struct(valueCols.map(col): _*).as("__rpay"),
        lit(0).as("__side"))
    val l = left
      .withColumn("__rpay", lit(null).cast(r.schema("__rpay").dataType))
      .withColumn("__side", lit(1))
    val combined = l.unionByName(r, allowMissingColumns = true)
    // Backward scans ts ASC (running last = newest right <= l.ts);
    // forward scans ts DESC (running last = earliest right >= l.ts).
    // Either way side 0 sorts before 1 within a ts tie, so an equal
    // timestamp matches, and right rows duplicated on (key, ts) are
    // ordered by payload so `last` picks deterministically.
    val tsOrder = if (forward) col(tsCol).desc else col(tsCol).asc
    val w = Window.partitionBy(col(keyCol))
      .orderBy(tsOrder, col("__side"), col("__rpay"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = combined
      .withColumn("__match", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    matched.select(
      left.columns.map(col).toSeq ++
        valueCols.map(c => col(s"__match.$c").as(prefix + c)): _*)
  }

  /** NEAREST as-of join (pandas merge_asof direction='nearest'): each
    * left row matched to the right row minimizing |right.ts − left.ts|
    * on the same key; an exact distance tie prefers the BACKWARD
    * (earlier) match — the deterministic convention pinned in
    * AsOfSpec. Composed from one backward and one forward pass (two
    * key shuffles — still the union/running-last envelope, never a
    * range self-join), distances compared in exact integer
    * MICROseconds (`tsCol` must be a TIMESTAMP — comparator-parity
    * rule 7's domain). Unmatched-on-both-sides left rows keep null
    * payloads (left-outer semantics). */
  def asofNearest(left: DataFrame, right: DataFrame,
                  keyCol: String, tsCol: String,
                  valueCols: Seq[String], prefix: String = "asof_"): DataFrame = {
    val withTs = (valueCols :+ tsCol).distinct
    val b = asofBackward(left, right, keyCol, tsCol, withTs, "__asofb_")
    val bf = asofForward(b, right, keyCol, tsCol, withTs, "__asoff_")
    val bt = col("__asofb_" + tsCol)
    val ft = col("__asoff_" + tsCol)
    val useB = bt.isNotNull && (ft.isNull ||
      (unix_micros(col(tsCol)) - unix_micros(bt)) <=
        (unix_micros(ft) - unix_micros(col(tsCol))))
    val out = valueCols.foldLeft(bf) { (d, c) =>
      d.withColumn(prefix + c,
        when(useB, col("__asofb_" + c)).otherwise(col("__asoff_" + c)))
    }
    out.drop(withTs.flatMap(c => Seq("__asofb_" + c, "__asoff_" + c)): _*)
  }
}
