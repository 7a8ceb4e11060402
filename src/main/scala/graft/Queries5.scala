package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Final round-2 widening: edit distance, bitwise family, array set
  * operations (string-rendered — array cells compare unevenly through
  * pandas), GROUPING() flags over grouping sets.
  */
object Queries5 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(

    "q62_levenshtein" -> ((s, d) =>
      Tables.part(s, d).select(
          col("p_partkey"),
          levenshtein(col("p_brand"), col("p_type")).cast("long").as("lev_bt"),
          levenshtein(substring(col("p_name"), 1, 10),
                      substring(col("p_name"), 2, 10)).cast("long")
            .as("lev_shift"))
        .orderBy(col("p_partkey"))),

    "q63_bitwise" -> ((s, d) =>
      Tables.part(s, d).select(
          col("p_partkey"),
          col("p_size").bitwiseAND(lit(15)).cast("long").as("b_and"),
          col("p_size").bitwiseOR(lit(64)).cast("long").as("b_or"),
          col("p_size").bitwiseXOR(lit(21)).cast("long").as("b_xor"),
          shiftleft(col("p_size"), 2).cast("long").as("b_shl"),
          shiftright(col("p_size"), 1).cast("long").as("b_shr"),
          bit_count(col("p_size")).cast("int").as("b_pop"))
        .orderBy(col("p_partkey"))),

    // array set algebra over tokenized names, rendered as sorted strings
    "q64_array_setops" -> ((s, d) => {
      val a = split(col("p_name"), " ")
      val b = split(col("p_type"), " ")
      Tables.part(s, d).select(
          col("p_partkey"),
          concat_ws(",", array_sort(array_intersect(a, b))).as("inter"),
          concat_ws(",", array_sort(array_union(a, b))).as("uni"),
          concat_ws(",", array_sort(array_except(a, b))).as("diff"),
          size(array_distinct(a)).cast("long").as("n_uniq"))
        .orderBy(col("p_partkey"))
    }),

    // GROUPING() flags distinguish "aggregated-away" from a real NULL key
    "q65_grouping_id" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("gi_lineitem")
      s.sql("""SELECT l_returnflag, l_linestatus,
              |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
              |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
              |  COUNT(*) AS n
              |FROM gi_lineitem
              |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
              |                        (l_returnflag), ())
              |ORDER BY g_rf, g_ls, l_returnflag ASC NULLS FIRST,
              |  l_linestatus ASC NULLS FIRST""".stripMargin)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q62_levenshtein" ->
      """SELECT p_partkey,
        |  CAST(levenshtein(p_brand, p_type) AS BIGINT) AS lev_bt,
        |  CAST(levenshtein(substr(p_name, 1, 10), substr(p_name, 2, 10))
        |    AS BIGINT) AS lev_shift
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q63_bitwise" ->
      """SELECT p_partkey,
        |  CAST(p_size & 15 AS BIGINT) AS b_and,
        |  CAST(p_size | 64 AS BIGINT) AS b_or,
        |  CAST(xor(p_size, 21) AS BIGINT) AS b_xor,
        |  CAST(p_size << 2 AS BIGINT) AS b_shl,
        |  CAST(p_size >> 1 AS BIGINT) AS b_shr,
        |  CAST(bit_count(p_size) AS INT) AS b_pop
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q64_array_setops" ->
      """WITH t AS (
        |  SELECT p_partkey,
        |    str_split(p_name, ' ') AS a, str_split(p_type, ' ') AS b
        |  FROM part)
        |SELECT p_partkey,
        |  COALESCE(array_to_string(list_sort(list_intersect(a, b)), ','), '')
        |    AS inter,
        |  COALESCE(array_to_string(list_sort(list_distinct(list_concat(a, b))),
        |    ','), '') AS uni,
        |  COALESCE(array_to_string(list_sort(list_filter(list_distinct(a),
        |    x -> NOT list_contains(b, x))), ','), '') AS diff,
        |  CAST(len(list_distinct(a)) AS BIGINT) AS n_uniq
        |FROM t ORDER BY p_partkey""".stripMargin,

    "q65_grouping_id" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
        |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |                        (l_returnflag), ())
        |ORDER BY g_rf, g_ls, l_returnflag ASC NULLS FIRST,
        |  l_linestatus ASC NULLS FIRST""".stripMargin
  )
}
