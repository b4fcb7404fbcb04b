package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Pattern-mining operators over behavioral baskets/sequences: pairwise
  * item co-occurrence (the level-2 a-priori support/lift table) and
  * top-k session paths. The reference treats each observation row
  * independently (`/root/reference/src/data/dataset.py` feature rows);
  * these are the cross-row structure queries a behavioral warehouse runs
  * to find correlated actions and dominant journeys.
  *
  * Scale shape: co-occurrence self-joins the DISTINCT (basket, item)
  * frame on the basket key — pair fan-out per basket is bounded by the
  * (small) distinct-item count, never the raw row count; paths are one
  * tiebroken keyed window + one hash aggregation.
  */
object PatternOps {

  /** Pairwise co-occurrence with support and lift: for every unordered
    * item pair {a, b}, the number of baskets containing both, and
    * lift = n·supp(a,b) / (supp(a)·supp(b)). Exact integer supports; the
    * lift division happens once, so the table is engine-portable.
    */
  def pairCooccurrence(df: DataFrame, basketCol: String,
      itemCol: String): DataFrame = {
    val items = df.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()
    val nBaskets = items.agg(countDistinct(col("__b")).as("__n"))
    val supp = items.groupBy(col("__i")).agg(count(lit(1)).as("__s"))
    val pairs = items.select(col("__b"), col("__i").as("item_a"))
      .join(items.select(col("__b"), col("__i").as("item_b")), Seq("__b"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(supp.select(col("__i").as("item_a"),
        col("__s").as("__sa"))), "item_a")
      .join(broadcast(supp.select(col("__i").as("item_b"),
        col("__s").as("__sb"))), "item_b")
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_both"),
        col("__sa").as("n_a"), col("__sb").as("n_b"),
        round((col("n_both") * col("__n")).cast("double") /
          (col("__sa") * col("__sb")), 6).as("lift"))
  }

  /** Top-`k` most common length-≤`pathLen` prefixes of per-key event
    * sequences, as '>'-joined strings (engine-portable; array formatting
    * is not). One tiebroken keyed window + two hash aggregations; only
    * the final top-k is a (bounded) global sort.
    */
  def topPaths(df: DataFrame, keyCol: String, tsCol: String,
      tiebreakCol: String, itemCol: String, pathLen: Int,
      k: Int): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tiebreakCol))
    val prefix = df
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= pathLen)
      .groupBy(col(keyCol))
      .agg(concat_ws(">",
        transform(sort_array(collect_list(struct(col("__rn"),
          col(itemCol).as("__it")))), x => x.getField("__it"))).as("path"))
    prefix.groupBy(col("path"))
      .agg(count(lit(1)).as("n_keys"))
      .orderBy(col("n_keys").desc, col("path"))
      .limit(k)
  }

  /** Frequent k-gram motifs: every length-`n` window of consecutive items
    * ANYWHERE in a key's ordered sequence (not just the prefix —
    * [[topPaths]]'s generalization), with occurrence counts and the count
    * of distinct keys exhibiting the motif; `minKeys` prunes the tail.
    * One tiebroken keyed window chain of lags + one motif-keyed
    * aggregation — the same cost shape as a bigram count regardless of n.
    */
  def frequentMotifs(df: DataFrame, keyCol: String, tsCol: String,
      tiebreakCol: String, itemCol: String, n: Int,
      minKeys: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tiebreakCol))
    val withLags = (1 until n).foldLeft(
        df.select(col(keyCol), col(tsCol), col(tiebreakCol),
          col(itemCol).as("__i0"))) { (d, j) =>
      d.withColumn(s"__i$j", lead(col("__i0"), j).over(w))
    }
    val motifs = withLags
      .filter((1 until n).map(j => col(s"__i$j").isNotNull)
        .reduceOption(_ && _).getOrElse(lit(true)))
      .select(col(keyCol),
        concat_ws(">", (0 until n).map(j => col(s"__i$j")): _*).as("motif"))
    motifs.groupBy(col("motif"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col(keyCol)).as("n_keys"))
      .filter(col("n_keys") >= minKeys)
  }
}
