package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.types._

class CorpusPlanStudySpec extends SparkSpec {

  test("TPC-DS naming-convention type rules") {
    assert(CorpusPlanStudy.inferType("ss_sold_date_sk") === LongType)
    assert(CorpusPlanStudy.inferType("d_fy_quarter_seq") === LongType)
    assert(CorpusPlanStudy.inferType("d_date") === DateType)
    assert(CorpusPlanStudy.inferType("d_year") === IntegerType)
    assert(CorpusPlanStudy.inferType("ws_quantity") === IntegerType)
    assert(CorpusPlanStudy.inferType("ss_list_price") === DecimalType(7, 2))
    assert(CorpusPlanStudy.inferType("i_brand") === StringType)
  }

  test("schema inference unions qualified column refs per table") {
    val sqls = Seq(
      """SELECT "item"."i_brand", COUNT(*) as agg_0 FROM "store_sales"
        | LEFT OUTER JOIN "item" ON "store_sales"."ss_item_sk" = "item"."i_item_sk"
        | WHERE "store_sales"."ss_quantity" IN (1, 2)""".stripMargin,
      """SELECT COUNT(*) as agg_0 FROM "item" WHERE "item"."i_size" = 'M'""")
    val s = CorpusPlanStudy.inferSchemas(sqls)
    assert(s.keySet === Set("store_sales", "item"))
    assert(s("item").fieldNames.toSet === Set("i_brand", "i_item_sk", "i_size"))
    assert(s("store_sales")("ss_item_sk").dataType === LongType)
    assert(s("store_sales")("ss_quantity").dataType === IntegerType)
  }

  test("Trino dialect shim: varchar cast + terminator") {
    assert(CorpusPlanStudy.normalizeTrinoSql(
      """SELECT CAST("t"."c" AS varchar) FROM "t";""") ===
      """SELECT CAST("t"."c" AS string) FROM "t"""")
    // idempotent on already-clean text
    assert(CorpusPlanStudy.normalizeTrinoSql("SELECT 1") === "SELECT 1")
  }

  test("plan feature vector counts join/agg/predicate structure") {
    // the string filter sits on the LEFT table: a WHERE filter on the
    // right side would null-filter it and Catalyst (correctly) rewrites
    // LEFT OUTER -> INNER (EliminateOuterJoin); asserted separately below
    val sql =
      """SELECT "item"."i_brand", COUNT(*) as agg_0 FROM "store_sales"
        | LEFT OUTER JOIN "item" ON "store_sales"."ss_item_sk" = "item"."i_item_sk"
        | WHERE "store_sales"."ss_quantity" IN (1, 2, 3)
        |   AND "store_sales"."ss_mode" != 'M'
        | GROUP BY "item"."i_brand" ORDER BY "item"."i_brand";""".stripMargin
    CorpusPlanStudy.registerEmptyTables(spark,
      CorpusPlanStudy.inferSchemas(Seq(sql)))
    val v = CorpusPlanStudy.planFeatureVector(spark, sql)
    assert(v.isDefined, "query must plan")
    val f = CorpusPlanStudy.featureNames.zip(v.get).toMap
    // one left join (broadcast on empty tables), grouped aggregate
    assert(f("op_LeftJoin_REPLICATED") + f("op_LeftJoin_PARTITIONED") >= 1.0,
      s"left join survives planning: $f")
    assert(f("op_Aggregate_PARTIAL") >= 1.0 && f("op_Aggregate_FINAL") >= 1.0)
    assert(f("pred_in") >= 1.0, s"IN predicate counted: $f")
    assert(f("n_nodes") > 4.0)
    // malformed text returns None, never throws
    assert(CorpusPlanStudy.planFeatureVector(spark, "SELECT FROM WHERE").isEmpty)

    // right-side null-filtering WHERE predicate: the optimizer rewrites
    // the outer join to inner (the corpus' dominant LEFT JOIN shape
    // carries right-side filters, so InnerJoin counts are expected)
    val filtered = sql.replace(""""store_sales"."ss_mode"""", """"item"."i_size"""")
    CorpusPlanStudy.registerEmptyTables(spark,
      CorpusPlanStudy.inferSchemas(Seq(filtered)))
    val f2 = CorpusPlanStudy.featureNames
      .zip(CorpusPlanStudy.planFeatureVector(spark, filtered).get).toMap
    assert(f2("op_InnerJoin_REPLICATED") + f2("op_InnerJoin_PARTITIONED") >= 1.0,
      s"outer join eliminated to inner: $f2")
  }
}
