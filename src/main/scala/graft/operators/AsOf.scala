package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (time-travel) join: each left row picks up the latest right
  * row with `right.ts <= left.ts` for its key.
  *
  * This is the batch form of the reference's metadata lookup — token
  * metadata fetched "at final block" (token.rs get_nft_token queries
  * chain state as-of finality); with versioned metadata it becomes a
  * slowly-changing-dimension enrichment.
  *
  * Spark has no ASOF JOIN operator. The naive formulation
  * (equi-join on key + `r.ts <= l.ts` + argmax per left row) explodes
  * to |matches| pairs before reducing. This implementation is the
  * scalable composition: UNION both sides, one sort per key by
  * (ts, side), carry the right side's values forward with
  * `last(_, ignoreNulls)` — a single shuffle on the key, O(n+m) state,
  * no pair blow-up. Same trick works under Structured Streaming with
  * flatMapGroupsWithState holding the carry-forward value.
  */
object AsOf {

  /** The same as-of semantics as [[joinAsOf]] but as the custom
    * whole-operator plan ([[graft.plans.AsOfJoinPlan]] →
    * AsOfJoinExec): one shuffle + sort per side, then a streaming
    * per-partition merge with O(1) carried state. Requires
    * [[graft.plans.GraftExtensions]] on the session.
    */
  def joinAsOfNative(
      left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      valueCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.graft.bridge
    import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
    // re-alias the right side so a self-join can't alias-collide
    val rightFresh = right.select(
      right.columns.toSeq.map(c => right(c).as(s"__r_$c")): _*)
    val lPlan = bridge.analyzed(left)
    val rPlan = bridge.analyzed(rightFresh)
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name in ${plan.output.map(_.name)}"))
    val rv = valueCols.map(c => attr(rPlan, s"__r_$c"))
    val outAttrs = valueCols.zip(rv).map { case (c, a) =>
      AttributeReference(s"asof_$c", a.dataType, nullable = true)()
    }
    bridge.ofRows(left.sparkSession, graft.plans.AsOfJoinPlan(
      lPlan, rPlan,
      attr(lPlan, key), attr(rPlan, s"__r_$key"),
      attr(lPlan, leftTs), attr(rPlan, s"__r_$rightTs"),
      rv, outAttrs))
  }

  /** @param left       fact side (kept in full)
    * @param right      version side; only `valueCols` are carried
    * @param key        equi-join key column name (same name both sides)
    * @param leftTs     left event-time column name
    * @param rightTs    right version-time column name
    * @param valueCols  right columns to carry onto each left row
    */
  def joinAsOf(
      left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // SQL join semantics: null-key right rows can never match (the
    // union+window formulation would otherwise group them with
    // null-key LEFT rows, which a real join never does)
    val rightNonNull = right.filter(col(key).isNotNull)
    // Carry ONE struct of all valueCols, null only on LEFT rows: a
    // right row whose values are genuinely NULL still contributes a
    // non-null struct, so last(ignoreNulls) picks the latest right ROW
    // atomically — per-column carry would skip real NULLs and could
    // mix fields from different right rows.
    val structType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType, nullable = true)))
    // unified layout: key, __ts, __side (0 = right sorts first on tie),
    // left payload nulled on right rows and vice versa
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select(Seq(col(key), col("__ts"), col("__side")) ++
        leftCols.filterNot(_ == key).map(col) :+
        lit(null).cast(structType).as("__v"): _*)
    val r = rightNonNull
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select(Seq(col(key), col("__ts"), col("__side")) ++
        leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(valueCols.map(col): _*).as("__v"): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__v", last(col("__v"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(c => col("__v").getField(c).as(s"asof_$c")): _*)
  }
}
