package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the nearest right row at or
  * before (backward) or at or after (forward) the left row's time, per
  * key (SURVEY.md §2.5).
  *
  * Implementation is a tagged union + one running-last window — ONE
  * shuffle on the key, O(n log n) in the partition sort, no range join
  * and no per-row subquery. This is the shape that survives 100 TB: a
  * range-condition join would force a quadratic band comparison, and a
  * correlated subquery one scan per row; here both sides shuffle once on
  * the key and a single ordered pass resolves every lookup.
  *
  * Tie semantics: a right row at exactly the left row's timestamp
  * matches (as-of "<=" / ">="). Right rows sort before left rows at
  * equal timestamps. Among right rows sharing key AND timestamp the
  * winner is arbitrary (partitioning-dependent) UNLESS a `tiebreaker`
  * column is supplied — pass one (a sequence number, an ingest id)
  * whenever the right side can carry same-instant duplicates and you
  * need run-to-run determinism; backward the GREATEST tiebreaker wins
  * (latest), forward the SMALLEST wins (earliest).
  * The strict-before variant is `graft.queries.Events` e4, which
  * composes the same window with an exclusive frame.
  *
  * Null semantics: right rows with a null timestamp are excluded (they
  * are not "at or before/after" anything); left rows with a null
  * timestamp match nothing and carry null values; a matched right row
  * is attached ATOMICALLY — its value columns arrive exactly as that
  * row holds them, including genuine nulls.
  */
object AsOfJoin {

  /** Latest right row at or before the left row's time.
    * @param valueCols  right-side columns to carry (emitted as-is, null
    *                   when no right row precedes the left row).
    * @param tiebreaker optional right-side column ordering same-instant
    *                   right duplicates; the greatest value wins. */
  def latestAtOrBefore(left: DataFrame, right: DataFrame, keys: Seq[String],
                       leftTs: String, rightTs: String,
                       valueCols: Seq[String],
                       tiebreaker: Option[String] = None): DataFrame =
    directional(left, right, keys, leftTs, rightTs, valueCols, tiebreaker,
      forward = false)

  /** Earliest right row at or after the left row's time (the forward
    * direction: "next reading after this event"). Same single-shuffle
    * shape; the window simply runs time-descending, so the running-last
    * pick is the SMALLEST right ts >= the left ts. The smallest
    * tiebreaker value wins among same-instant right rows. */
  def earliestAtOrAfter(left: DataFrame, right: DataFrame, keys: Seq[String],
                        leftTs: String, rightTs: String,
                        valueCols: Seq[String],
                        tiebreaker: Option[String] = None): DataFrame =
    directional(left, right, keys, leftTs, rightTs, valueCols, tiebreaker,
      forward = true)

  private def directional(left: DataFrame, right: DataFrame, keys: Seq[String],
                          leftTs: String, rightTs: String,
                          valueCols: Seq[String],
                          tiebreaker: Option[String],
                          forward: Boolean): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val leftCols = left.columns.toSeq
    require(valueCols.nonEmpty, "valueCols must name at least one right column")
    require(valueCols.intersect(leftCols).isEmpty,
      s"valueCols ${valueCols.intersect(leftCols).mkString(",")} collide with left columns — alias them first")
    // tagged union: right rows (side=0) sort before left rows (side=1)
    // at the same instant, so the tie instant is included in BOTH
    // directions; __tb breaks same-instant right-vs-right ties
    // deterministically when supplied.
    // The carried values ride as ONE struct, not per-column fills: a
    // per-column last(ignoreNulls) would replace a genuine null in the
    // nearest row's column with a staler row's value, emitting a mixed
    // row that never existed — the struct is non-null exactly when a
    // right row matched, so the nearest row is attached atomically,
    // nulls and all.
    val valType = StructType(valueCols.map(c => right.schema(c)))
    val l = left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))
      .withColumn("__tb",
        tiebreaker.map(t => lit(null).cast(right.schema(t).dataType)).getOrElse(lit(0)))
      .withColumn("__val", lit(null).cast(valType))
    // a right row with a null timestamp is not "at or before/after"
    // anything — it must never win a lookup
    val r = leftCols.filterNot(keys.contains).foldLeft(
      right.filter(col(rightTs).isNotNull)
        .withColumn("__ts", col(rightTs)).withColumn("__side", lit(0))
        .withColumn("__tb", tiebreaker.map(col).getOrElse(lit(0)))
        .withColumn("__val", struct(valueCols.map(col): _*))) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val outCols = keys ++ leftCols.filterNot(keys.contains) ++
      Seq("__ts", "__side", "__tb", "__val")
    val unioned = l.select(outCols.map(col): _*)
      .unionByName(r.select(outCols.map(col): _*))
    // backward: ascending scan, last-seen right row = latest <= left.
    // forward: descending scan, last-seen right row = earliest >= left;
    // __tb descends too so the SMALLEST tiebreaker is scanned last.
    // Null-ts LEFT rows have no match in either direction, so they must
    // scan before any right row: asc puts nulls first by default, the
    // forward (desc) scan needs nulls-first made explicit.
    val ordering: Seq[Column] =
      if (forward) Seq(col("__ts").desc_nulls_first, col("__side").asc, col("__tb").desc)
      else Seq(col("__ts").asc_nulls_first, col("__side").asc, col("__tb").asc)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned
      .withColumn("__val", last(col("__val"), ignoreNulls = true).over(w))
    valueCols.foldLeft(filled) { (df, c) =>
      df.withColumn(c, col("__val").getField(c))
    }.filter(col("__side") === 1).drop("__ts", "__side", "__tb", "__val")
  }
}
