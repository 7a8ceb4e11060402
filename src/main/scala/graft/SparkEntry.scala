package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared operator inventory (SURVEY.md §2 reference
  * parity in [[Queries]]; training-data-pipeline extensions in
  * [[ExtensionQueries]]); `oracleSql` carries the DuckDB twin of each
  * query. Queries without an entry in `oracleSql` (hash-sketch dedup)
  * get the driver's rows-only check.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q13_household")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.sparkQueries ++ ExtensionQueries.sparkQueries ++
      Queries2.sparkQueries ++ Queries3.sparkQueries ++
      Queries4.sparkQueries ++ Queries5.sparkQueries ++
      Queries6.sparkQueries ++ Queries7.sparkQueries ++
      Queries8.sparkQueries ++ Queries9.sparkQueries ++
      Queries10.sparkQueries ++ Queries11.sparkQueries ++
      Queries12.sparkQueries ++ Queries13.sparkQueries ++
      Queries14.sparkQueries ++ Queries15.sparkQueries ++
      Queries16.sparkQueries ++ Queries17.sparkQueries ++
      Queries18.sparkQueries ++ Queries19.sparkQueries ++
      Queries20.sparkQueries ++ Queries21.sparkQueries ++
      Queries22.sparkQueries ++ Queries23.sparkQueries ++
      Queries24.sparkQueries ++ Queries25.sparkQueries ++
      Queries26.sparkQueries ++ Queries27.sparkQueries ++
      Queries28.sparkQueries ++ Queries29.sparkQueries ++
      Queries30.sparkQueries ++ Queries31.sparkQueries ++
      Queries32.sparkQueries ++ Queries33.sparkQueries ++
      Queries34.sparkQueries ++ Queries35.sparkQueries ++
      Queries36.sparkQueries ++ Queries37.sparkQueries ++
      Queries38.sparkQueries ++ Queries39.sparkQueries ++
      Queries40.sparkQueries ++ Queries41.sparkQueries ++
      Queries42.sparkQueries ++ Queries43.sparkQueries ++
      Queries44.sparkQueries ++ Queries45.sparkQueries ++
      Queries46.sparkQueries ++ Queries47.sparkQueries ++
      Queries48.sparkQueries ++ Queries49.sparkQueries ++
      Queries50.sparkQueries ++ Queries51.sparkQueries ++
      Queries52.sparkQueries ++ Queries53.sparkQueries ++
      Queries54.sparkQueries ++ Queries55.sparkQueries ++
      Queries56.sparkQueries ++ Queries57.sparkQueries ++
      Queries58.sparkQueries ++ Queries59.sparkQueries ++
      Queries60.sparkQueries ++ Queries61.sparkQueries ++
      Queries62.sparkQueries ++ Queries63.sparkQueries ++
      Queries64.sparkQueries ++ Queries65.sparkQueries ++
      Queries66.sparkQueries ++ Queries67.sparkQueries ++
      Queries68.sparkQueries ++ Queries69.sparkQueries ++
      Queries70.sparkQueries ++ Queries71.sparkQueries ++
      Queries72.sparkQueries ++ Queries73.sparkQueries ++
      Queries74.sparkQueries ++ Queries75.sparkQueries ++
      Queries76.sparkQueries ++ Queries77.sparkQueries ++
      Queries78.sparkQueries ++ Queries79.sparkQueries ++
      Queries80.sparkQueries ++ Queries81.sparkQueries ++
      Queries82.sparkQueries ++ Queries83.sparkQueries ++
      Queries84.sparkQueries ++ Queries85.sparkQueries ++
      Queries86.sparkQueries ++ Queries87.sparkQueries ++
      Queries88.sparkQueries ++ Queries89.sparkQueries ++
      Queries90.sparkQueries ++ Queries91.sparkQueries ++
      Queries92.sparkQueries ++ Queries93.sparkQueries ++
      Queries94.sparkQueries ++ Queries95.sparkQueries ++
      Queries96.sparkQueries ++ Queries97.sparkQueries ++
      Queries98.sparkQueries ++ Queries99.sparkQueries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Queries.oracleSqlCore ++ ExtensionQueries.oracleSql ++
      Queries2.oracleSql ++ Queries3.oracleSql ++
      Queries4.oracleSql ++ Queries5.oracleSql ++
      Queries6.oracleSql ++ Queries7.oracleSql ++
      Queries8.oracleSql ++ Queries9.oracleSql ++ Queries10.oracleSql ++
      Queries11.oracleSql ++ Queries12.oracleSql ++ Queries13.oracleSql ++
      Queries14.oracleSql ++ Queries15.oracleSql ++ Queries16.oracleSql ++
      Queries17.oracleSql ++ Queries18.oracleSql ++ Queries19.oracleSql ++
      Queries20.oracleSql ++ Queries21.oracleSql ++ Queries22.oracleSql ++
      Queries23.oracleSql ++ Queries24.oracleSql ++ Queries25.oracleSql ++
      Queries26.oracleSql ++ Queries27.oracleSql ++ Queries28.oracleSql ++
      Queries29.oracleSql ++ Queries30.oracleSql ++
      Queries31.oracleSql ++ Queries32.oracleSql ++ Queries33.oracleSql ++
      Queries34.oracleSql ++ Queries35.oracleSql ++ Queries36.oracleSql ++
      Queries37.oracleSql ++ Queries38.oracleSql ++ Queries39.oracleSql ++ Queries40.oracleSql ++
      Queries41.oracleSql ++ Queries42.oracleSql ++ Queries43.oracleSql ++
      Queries44.oracleSql ++ Queries45.oracleSql ++ Queries46.oracleSql ++
      Queries47.oracleSql ++ Queries48.oracleSql ++ Queries49.oracleSql ++
      Queries50.oracleSql ++ Queries51.oracleSql ++ Queries52.oracleSql ++
      Queries53.oracleSql ++ Queries54.oracleSql ++ Queries55.oracleSql ++
      Queries56.oracleSql ++ Queries57.oracleSql ++ Queries58.oracleSql ++
      Queries59.oracleSql ++ Queries60.oracleSql ++ Queries61.oracleSql ++
      Queries62.oracleSql ++ Queries63.oracleSql ++ Queries64.oracleSql ++
      Queries65.oracleSql ++ Queries66.oracleSql ++ Queries67.oracleSql ++
      Queries68.oracleSql ++ Queries69.oracleSql ++ Queries70.oracleSql ++
      Queries71.oracleSql ++ Queries72.oracleSql ++ Queries73.oracleSql ++
      Queries74.oracleSql ++ Queries75.oracleSql ++ Queries76.oracleSql ++
      Queries77.oracleSql ++ Queries78.oracleSql ++ Queries79.oracleSql ++
      Queries80.oracleSql ++ Queries81.oracleSql ++ Queries82.oracleSql ++
      Queries83.oracleSql ++ Queries84.oracleSql ++ Queries85.oracleSql ++
      Queries86.oracleSql ++ Queries87.oracleSql ++ Queries88.oracleSql ++
      Queries89.oracleSql ++ Queries90.oracleSql ++ Queries91.oracleSql ++
      Queries92.oracleSql ++ Queries93.oracleSql ++ Queries94.oracleSql ++
      Queries95.oracleSql ++ Queries96.oracleSql ++ Queries97.oracleSql ++
      Queries98.oracleSql ++ Queries99.oracleSql
}
