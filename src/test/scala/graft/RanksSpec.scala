package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Ranks

/** Direct contract tests for the distributed exact-rank engine the
  * catalog's global orderings ride on (q49/q174/q179/q192/q195 numeric,
  * q170/q184 string-prefix, q200 deciles): the bucketed two-phase
  * decomposition must equal the naive single-task window BIT-FOR-BIT on
  * adversarial inputs — duplicates, skew, negatives, tiny frames, and
  * every bucket-count edge. */
class RanksSpec extends SparkSpecBase {
  import spark.implicits._

  private def naiveRank(df: org.apache.spark.sql.DataFrame, v: String, id: String) =
    df.withColumn("want",
      row_number().over(Window.orderBy(col(v), col(id))).cast("long"))

  test("withGlobalRank equals the naive global window on varied frames") {
    val cases = Seq(
      // label, values (value, id)
      "uniform" -> (1 to 1000).map(i => ((i * 7919) % 503 / 7.0, i.toLong)),
      "heavy duplicates" -> (1 to 800).map(i => ((i % 5).toDouble, i.toLong)),
      "all equal" -> (1 to 100).map(i => (42.0, i.toLong)),
      "negatives and wide range" ->
        (1 to 500).map(i => (math.sin(i) * 1e9 - 5e8, i.toLong)),
      "two rows" -> Seq((2.0, 1L), (1.0, 2L)),
      "one row" -> Seq((0.0, 7L)))
    cases.foreach { case (label, data) =>
      withClue(s"case: $label — ") {
        val df = data.toDF("v", "id").repartition(7)
        for (buckets <- Seq(2, 16, 1024)) {
          val got = Ranks.withGlobalRank(df, "v", "id", "rn", "n", buckets)
          val joined = naiveRank(df, "v", "id")
            .join(got, Seq("v", "id"))
          joined.filter($"want" =!= $"rn").count() shouldBe 0
          got.select($"n").distinct().as[Long].collect() shouldBe Array(data.size.toLong)
        }
      }
    }
  }

  test("null sort keys rank first (asc_nulls_first) and are never dropped") {
    // numeric: nulls get the leading bucket, tie-broken by id
    val data: Seq[(Option[Double], Long)] =
      Seq((None, 3L), (Some(2.0), 1L), (None, 9L), (Some(-1.0), 2L),
        (Some(2.0), 7L), (None, 8L))
    val df = data.toDF("v", "id").repartition(3)
    val got = Ranks.withGlobalRank(df, "v", "id", "rn", "n", 8)
    got.count() shouldBe data.size.toLong
    got.select($"n").distinct().as[Long].collect() shouldBe Array(data.size.toLong)
    naiveRank(df, "v", "id").join(got, Seq("id"))
      .filter($"want" =!= $"rn").count() shouldBe 0
    // all-null column still ranks every row
    val allNull = Seq((Option.empty[Double], 1L), (None, 2L), (None, 3L))
      .toDF("v", "id")
    val gotAll = Ranks.withGlobalRank(allNull, "v", "id", "rn", "n", 4)
    gotAll.count() shouldBe 3L
    gotAll.orderBy($"id").select($"rn").as[Long].collect() shouldBe Array(1L, 2L, 3L)
    // string dictionary with nulls and empty strings
    val words = Seq(Some("aa"), None, Some(""), Some("ab"), None, Some("b"))
      .zipWithIndex.map { case (s, i) => (s, i.toLong) }
    val sdf = words.toDF("s", "id").repartition(2)
    val gotS = Ranks.withGlobalRankByPrefix(sdf, "s", "rn", "n", 2)
    gotS.count() shouldBe words.size.toLong
    val wantS = sdf.withColumn("want",
      row_number().over(Window.orderBy($"s", $"id")).cast("long"))
    // the engine orders by s alone; tie-break nulls/dups via id in both
    // sides for a deterministic comparison of the s-order CLASSES:
    // group ranks by s-value and compare the sorted rank sets
    val gotSets = gotS.groupBy($"s").agg(sort_array(collect_list($"rn")).as("g"))
    val wantSets = wantS.groupBy($"s").agg(sort_array(collect_list($"want")).as("w"))
    gotSets.join(wantSets, gotSets("s") <=> wantSets("s"))
      .filter($"g" =!= $"w").count() shouldBe 0
  }

  test("withGlobalRankByPrefix equals the naive window for string dictionaries") {
    val dicts = Seq(
      "names" -> Seq("almond", "azure", "beige", "bisque", "blush",
        "a", "ab", "abc", "z", "zz", "m", "mm"),
      "shared prefixes" -> Seq("aaa", "aab", "aac", "aba", "abb", "ba", "bb"),
      "single" -> Seq("only"))
    dicts.foreach { case (label, words) =>
      withClue(s"case: $label — ") {
        val df = words.toDF("s").repartition(3)
        for (plen <- Seq(1, 2, 5)) {
          val got = Ranks.withGlobalRankByPrefix(df, "s", "rn", "n", plen)
          val want = df.withColumn("want",
            row_number().over(Window.orderBy($"s")).cast("long"))
          want.join(got, Seq("s")).filter($"want" =!= $"rn").count() shouldBe 0
        }
      }
    }
  }

  test("ntileFromRank matches Spark's ntile for every (n, k) shape") {
    for (n <- Seq(1, 2, 9, 10, 11, 100, 137); k <- Seq(1, 2, 4, 10, 150)) {
      val df = (1 to n).map(i => (i.toDouble, i.toLong)).toDF("v", "id")
      val got = Ranks.withGlobalRank(df, "v", "id", "rn", "n_", 8)
        .withColumn("tile", Ranks.ntileFromRank("rn", "n_", k))
      val want = df.withColumn("tile_want",
        ntile(k).over(Window.orderBy($"v", $"id")))
      withClue(s"n=$n k=$k — ") {
        want.join(got, Seq("v", "id"))
          .filter($"tile" =!= $"tile_want").count() shouldBe 0
      }
    }
  }

  test("percentRankFromRank matches percent_rank under a unique tiebreak") {
    val df = (1 to 57).map(i => ((i % 9).toDouble, i.toLong)).toDF("v", "id")
    val got = Ranks.withGlobalRank(df, "v", "id", "rn", "n_", 4)
      .withColumn("pr", Ranks.percentRankFromRank("rn", "n_"))
    val want = df.withColumn("pr_want",
      percent_rank().over(Window.orderBy($"v", $"id")))
    want.join(got, Seq("v", "id"))
      .filter($"pr" =!= $"pr_want").count() shouldBe 0
    // n = 1: percent_rank is defined 0
    val one = Ranks.withGlobalRank(Seq((5.0, 1L)).toDF("v", "id"),
      "v", "id", "rn", "n_")
    one.select(Ranks.percentRankFromRank("rn", "n_")).as[Double].head() shouldBe 0.0
  }
}
