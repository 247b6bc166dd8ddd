package graft.queries

import graft.{Q, Tables}
import graft.functions.WelfordStats
import org.apache.spark.sql.functions._

/** `orders` row as a case class — the typed-Dataset element for k4. */
final case class OrderRow(
    o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
    o_totalprice: Double, o_orderdate: java.sql.Timestamp,
    o_orderpriority: String)

/** SURVEY §2 category K — the user-defined-function surface. Kept
  * deliberately tiny: built-ins and higher-order functions beat UDFs
  * (codegen, null-safety, pushdown), so exactly one scalar UDF and one typed
  * Aggregator exist to cover the extension points.
  */
object CustomFns {

  /** Distinct 5-char shingle count — a genuine Scala closure (the one
    * operation in the inventory where a JVM sliding-window is clearer than
    * nested higher-order SQL).
    */
  private val nShingles =
    udf((text: String) =>
      // null-safe; <5 chars has zero 5-shingles (sliding would emit one
      // partial window, diverging from the oracle's empty generate_series)
      if (text == null || text.length < 5) 0L
      else text.sliding(5).toSet.size.toLong)

  val queries: Seq[Q] = Seq(
    Q("k1_scala_udf",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), nShingles(col("text")).as("n_shingles"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
                     CAST(len(list_distinct(list_transform(
                       generate_series(1, length(text)-4),
                       i -> substring(text, i, 5)))) AS BIGINT) AS n_shingles
              FROM documents ORDER BY doc_id""")),

    // Typed Aggregator (modern UDAF): one-pass Welford moments vs DuckDB's
    // native avg/stddev_samp. Output rounded to 2 — both algorithms are
    // numerically stable, agreeing far below that precision.
    Q("k2_typed_aggregator",
      (s, d) => {
        val stats = udaf(WelfordStats)
        Tables.orders(s, d)
          .groupBy("o_orderstatus")
          .agg(stats(col("o_totalprice")).as("st"))
          .select(col("o_orderstatus"),
            col("st.n").as("n_orders"),
            round(col("st.avg"), 2).as("avg_price"),
            round(col("st.sd"), 2).as("sd_price"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n_orders,
                     round(AVG(o_totalprice), 2) AS avg_price,
                     round(stddev_samp(o_totalprice), 2) AS sd_price
              FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Typed Dataset[T] pipeline — case-class Encoder, typed filter/map,
    // groupByKey + mapGroups. Scale note stated honestly: mapGroups ships
    // every row through the shuffle (no partial aggregation) — it exists
    // for arbitrary per-group logic; for algebraic aggregates the k2
    // Aggregator (map-side-combining) is the right tool. Integer-cents sums
    // keep the result order-independent.
    Q("k4_typed_dataset",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d).as[OrderRow]
          .filter(_.o_orderstatus == "F")
          .groupByKey(_.o_custkey)
          .mapGroups { (k, rows) =>
            var cents = 0L; var n = 0L
            rows.foreach { o =>
              cents += math.round(o.o_totalprice * 100); n += 1 }
            (k, n, cents)
          }
          .toDF("o_custkey", "n_orders", "cents")
          .orderBy("o_custkey")
      },
      Some("""SELECT o_custkey, COUNT(*) AS n_orders,
                     CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT))
                       AS BIGINT) AS cents
              FROM orders WHERE o_orderstatus = 'F'
              GROUP BY o_custkey ORDER BY o_custkey""")),

    // SQL-defined UDF (round 16) — Spark 4's CREATE FUNCTION ... RETURN
    // <expression> (SQL UDF), the fourth and SCALE-PREFERRED extension
    // point: unlike k1's JVM closure, a SQL UDF is INLINED into the plan
    // at analysis time (PlanSpec pins zero ScalaUDF nodes), so it rides
    // whole-stage codegen, null-safety and pushdown for free — the UDF
    // mechanism with no UDF tax. The body is the engine's integer-cents
    // revenue convention; the oracle states the same expression inline
    // (the driver harness runs ONE statement, and the truth doesn't need
    // the mechanism — the mechanism is what's under test on the Spark
    // side). QueriesSpec additionally pins k5 ≡ the inlined-expression
    // DataFrame twin row-for-row.
    Q("k5_sql_udf",
      (s, d) => {
        Tables.registerAllViews(s, d)
        s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_revenue(
                   p DOUBLE, disc DOUBLE) RETURNS BIGINT
                 RETURN CAST(round(p * (1 - disc) * 100) AS BIGINT)""")
        s.sql("""SELECT l_returnflag,
                        CAST(sum(graft_revenue(l_extendedprice,
                                               l_discount)) AS BIGINT)
                          AS rev_cents,
                        count(*) AS n_lines
                 FROM lineitem GROUP BY 1 ORDER BY 1""")
      },
      Some("""SELECT l_returnflag,
                     CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                       * 100) AS BIGINT)) AS BIGINT) AS rev_cents,
                     count(*) AS n_lines
              FROM lineitem GROUP BY 1 ORDER BY 1"""))
  )
}
