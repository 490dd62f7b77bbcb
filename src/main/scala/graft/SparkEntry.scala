package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every query is also expressed as DuckDB-runnable SQL in [[oracleSql]];
  * column names, types and rounding are aligned on both sides (SURVEY.md §3).
  * Queries end with an ORDER BY over their natural key so output is
  * deterministic regardless of partitioning.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    SensorRank.sensorRank(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_resample_avg" -> ((s, d) =>
      TimeSeries.resampleAvg(s, d).orderBy(col("event_type"), col("bucket_start"))),
    "q02_resample_ffill" -> ((s, d) =>
      TimeSeries.resampleFfill(s, d).orderBy(col("event_type"), col("grid_start"))),
    "q03_rolling_avg" -> ((s, d) =>
      TimeSeries.rollingAvg(s, d).orderBy(col("user_id"), col("event_id"))),
    "q04_range_flags" -> ((s, d) =>
      Ranges.rangeFlags(s, d).orderBy(col("event_type"), col("in_anomaly"))),
    "q05_sensor_rank" -> ((s, d) =>
      SensorRank.sensorRank(s, d).orderBy(col("rank"))),
    "q06_anomaly_ranges" -> ((s, d) =>
      Ranges.anomalyRanges(s, d).orderBy(col("user_id"), col("range_start"))),
    "q07_off_condition" -> ((s, d) =>
      Ranges.offCondition(s, d).orderBy(col("event_type"))),
    "q08_train_test_split" -> ((s, d) =>
      Ranges.trainTestSplit(s, d).orderBy(col("event_type"), col("phase"))),
    "q09_diag_expand" -> ((s, d) =>
      Ranges.diagExpand(s, d).orderBy(col("event_type"))),
    "q10_schema_infer" -> ((s, d) =>
      Ranges.schemaInfer(s, d).orderBy(col("event_type"))),
    "q11_seq_extract" -> ((s, d) =>
      TimeSeries.seqExtract(s, d).orderBy(col("seq"), col("event_type"))),
    "q12_interp_linear" -> ((s, d) =>
      TimeSeries.interpLinear(s, d).orderBy(col("event_type"), col("grid_start"))),
    "q13_pricing_summary" -> ((s, d) =>
      Relational.pricingSummary(s, d).orderBy(col("l_returnflag"), col("l_linestatus"))),
    "q14_top_revenue" -> ((s, d) => Relational.topRevenue(s, d)),
    "q15_region_rollup" -> ((s, d) =>
      Relational.regionRollup(s, d).orderBy(col("r_name"), col("n_name"))),
    "q16_window_topn" -> ((s, d) =>
      Relational.windowTopN(s, d).orderBy(col("o_custkey"), col("rk"))),
    "q17_semi_anti" -> ((s, d) =>
      Relational.semiAnti(s, d).orderBy(col("c_mktsegment"))),
    "q18_decorrelated_agg" -> ((s, d) =>
      Relational.decorrelatedAgg(s, d).orderBy(col("o_custkey")))
  )

  def oracleSql: Map[String, String] = Map(
    "q01_resample_avg" ->
      """SELECT event_type, CAST(floor(epoch(ts)/300)*300 AS BIGINT) AS bucket_start,
        | round(avg(value),4) AS avg_value, round(min(value),4) AS min_value,
        | round(max(value),4) AS max_value, count(*) AS n
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q02_resample_ffill" ->
      """WITH b AS (SELECT CAST(floor(min(epoch(ts))/3600)*3600 AS BIGINT) mn,
        |                  CAST(floor(max(epoch(ts))/3600)*3600 AS BIGINT) mx FROM events),
        |g AS (SELECT t.event_type, b.mn + 3600*gs.g AS grid_start
        |      FROM b, (SELECT DISTINCT event_type FROM events) t, generate_series(0,2000) gs(g)
        |      WHERE b.mn + 3600*gs.g <= b.mx),
        |h AS (SELECT event_type, CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) grid_start, avg(value) v
        |      FROM events GROUP BY 1,2)
        |SELECT g.event_type, g.grid_start,
        | round(last_value(h.v IGNORE NULLS) OVER (PARTITION BY g.event_type ORDER BY g.grid_start
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),4) AS value_ffill
        |FROM g LEFT JOIN h ON g.event_type=h.event_type AND g.grid_start=h.grid_start
        |ORDER BY 1,2""".stripMargin,
    "q03_rolling_avg" ->
      """SELECT user_id, event_id,
        | CAST(row_number() OVER w AS INT) AS rn,
        | round((CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (w ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |   / count(value) OVER (w ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))*10000)/10000 AS roll_avg
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,
    "q04_range_flags" ->
      """WITH ranges AS (
        | SELECT user_id, min(CAST(floor(epoch(ts)) AS BIGINT)) range_start,
        |        max(CAST(floor(epoch(ts)) AS BIGINT)) range_end
        | FROM events WHERE event_type='error'
        | GROUP BY user_id, CAST(floor(epoch(ts)/86400)*86400 AS BIGINT)),
        |flagged AS (
        | SELECT e.event_id, e.event_type, e.value,
        |        max(CASE WHEN r.user_id IS NOT NULL THEN 1 ELSE 0 END) AS in_anomaly
        | FROM events e LEFT JOIN ranges r
        |   ON e.user_id = r.user_id
        |  AND CAST(floor(epoch(e.ts)) AS BIGINT) BETWEEN r.range_start AND r.range_end
        | GROUP BY e.event_id, e.event_type, e.value)
        |SELECT event_type, in_anomaly, count(*) AS n, round(avg(value),4) AS avg_value
        |FROM flagged GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q05_sensor_rank" ->
      """WITH ev AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) e, value FROM events),
        |sp AS (SELECT CAST(floor(min(e)+(max(e)-min(e))*0.75) AS BIGINT) split_e FROM ev),
        |st AS (SELECT event_type, min(value) vmin, max(value) vmax,
        |              (max(value)-min(value))/20 width FROM ev GROUP BY 1),
        |binned AS (
        | SELECT ev.event_type, CASE WHEN ev.e < sp.split_e THEN 'u' ELSE 'v' END phase,
        |        least(CAST(floor((ev.value - st.vmin)/st.width) AS BIGINT), 19) bin
        | FROM ev JOIN st ON ev.event_type = st.event_type CROSS JOIN sp),
        |counts AS (SELECT event_type, phase, bin, count(*) c FROM binned GROUP BY 1,2,3),
        |totals AS (SELECT event_type, phase, CAST(sum(c) AS BIGINT) total FROM counts GROUP BY 1,2),
        |grid AS (SELECT st.event_type, gs.g AS bin, ph.phase
        |         FROM st, generate_series(0,19) gs(g),
        |              (SELECT 'u' AS phase UNION ALL SELECT 'v') ph),
        |dens AS (SELECT g.event_type, g.phase, g.bin,
        |           coalesce(CAST(c.c AS DOUBLE)/t.total, 0.0) d
        |         FROM grid g
        |         LEFT JOIN counts c ON g.event_type=c.event_type AND g.phase=c.phase AND g.bin=c.bin
        |         LEFT JOIN totals t ON g.event_type=t.event_type AND g.phase=t.phase),
        |ranked AS (SELECT event_type, phase, d,
        |             row_number() OVER (PARTITION BY event_type, phase ORDER BY d, bin) pos
        |           FROM dens),
        |scores AS (SELECT u.event_type, round(avg(abs(u.d - v.d)),6) score
        |           FROM ranked u JOIN ranked v
        |             ON u.event_type=v.event_type AND u.pos=v.pos AND u.phase='u' AND v.phase='v'
        |           GROUP BY 1)
        |SELECT event_type, score,
        |  CAST(row_number() OVER (ORDER BY score DESC, event_type) AS INT) rank
        |FROM scores ORDER BY rank""".stripMargin,
    "q06_anomaly_ranges" ->
      """WITH errs AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) e
        |              FROM events WHERE event_type='error'),
        |s AS (SELECT user_id, e,
        |        CASE WHEN lag(e) OVER (PARTITION BY user_id ORDER BY e) IS NULL
        |               OR e - lag(e) OVER (PARTITION BY user_id ORDER BY e) > 1800
        |             THEN 1 ELSE 0 END new_session
        |      FROM errs),
        |s2 AS (SELECT user_id, e,
        |         sum(new_session) OVER (PARTITION BY user_id ORDER BY e
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) sess
        |       FROM s)
        |SELECT user_id, min(e) range_start, max(e) range_end, count(*) n_events
        |FROM s2 GROUP BY user_id, sess HAVING count(*) >= 2
        |ORDER BY user_id, range_start""".stripMargin,
    "q07_off_condition" ->
      """SELECT event_type,
        | CAST(sum(CASE WHEN value >= 10.0 THEN 1 ELSE 0 END) AS BIGINT) n_on,
        | CAST(sum(CASE WHEN value >= 10.0 THEN 0 ELSE 1 END) AS BIGINT) n_off,
        | round(avg(CASE WHEN value >= 10.0 THEN value END),4) avg_on_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q08_train_test_split" ->
      """WITH ev AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) e, value FROM events),
        |sp AS (SELECT CAST(floor(min(e)+(max(e)-min(e))*0.7) AS BIGINT) split_e FROM ev)
        |SELECT event_type, CASE WHEN e < split_e THEN 'train' ELSE 'eval' END phase,
        | count(*) n, round(avg(value),4) avg_value
        |FROM ev, sp GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q09_diag_expand" ->
      """SELECT event_type,
        | round(avg(CAST(regexp_extract(props,'([0-9]+)',1) AS INT)),4) avg_diag,
        | max(CAST(regexp_extract(props,'([0-9]+)',1) AS INT)) max_diag,
        | count(DISTINCT CAST(regexp_extract(props,'([0-9]+)',1) AS INT)) n_distinct_diag,
        | round(avg(value),4) avg_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q10_schema_infer" ->
      """SELECT event_type, count(*) n_rows, count(DISTINCT user_id) n_users,
        | min(CAST(floor(epoch(ts)) AS BIGINT)) min_ts, max(CAST(floor(epoch(ts)) AS BIGINT)) max_ts,
        | round(min(value),4) min_value, round(max(value),4) max_value, round(avg(value),4) avg_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q11_seq_extract" ->
      """WITH ev AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) e, value FROM events),
        |b AS (SELECT CAST(floor((min(e)+(max(e)-min(e))*0.75)/300)*300 AS BIGINT) eval_start FROM ev)
        |SELECT CAST(floor((e - eval_start)/300.0) AS BIGINT) seq, event_type, count(*) n,
        | min(e - eval_start) min_rel, max(e - eval_start) max_rel, round(avg(value),4) avg_value
        |FROM ev, b WHERE e >= eval_start AND floor((e - eval_start)/300.0) < 3
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q12_interp_linear" ->
      """WITH b AS (SELECT CAST(floor(min(epoch(ts))/3600)*3600 AS BIGINT) mn,
        |                  CAST(floor(max(epoch(ts))/3600)*3600 AS BIGINT) mx FROM events),
        |g AS (SELECT t.event_type, b.mn + 3600*gs.g AS grid_start
        |      FROM b, (SELECT DISTINCT event_type FROM events) t, generate_series(0,2000) gs(g)
        |      WHERE b.mn + 3600*gs.g <= b.mx),
        |h AS (SELECT event_type, CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) grid_start,
        |        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)/count(value) v
        |      FROM events GROUP BY 1,2),
        |j AS (SELECT g.event_type, g.grid_start, h.v
        |      FROM g LEFT JOIN h ON g.event_type=h.event_type AND g.grid_start=h.grid_start),
        |n AS (SELECT event_type, grid_start, v,
        |  last_value(v IGNORE NULLS) OVER w1 pv,
        |  last_value(CASE WHEN v IS NOT NULL THEN grid_start END IGNORE NULLS) OVER w1 pt,
        |  first_value(v IGNORE NULLS) OVER w2 nv,
        |  first_value(CASE WHEN v IS NOT NULL THEN grid_start END IGNORE NULLS) OVER w2 nt
        | FROM j WINDOW
        |  w1 AS (PARTITION BY event_type ORDER BY grid_start ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  w2 AS (PARTITION BY event_type ORDER BY grid_start ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_type, grid_start,
        | round((CASE WHEN v IS NOT NULL THEN v WHEN pv IS NULL THEN nv WHEN nv IS NULL THEN pv
        |  ELSE pv + (nv-pv)*(grid_start-pt)/(nt-pt) END)*10000)/10000 value_interp
        |FROM n ORDER BY 1,2""".stripMargin,
    "q13_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),4) sum_qty, round(sum(l_extendedprice),4) sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),4) sum_disc_price,
        | round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),4) sum_charge,
        | round(avg(l_quantity),4) avg_qty, round(avg(l_extendedprice),4) avg_price,
        | round(avg(l_discount),4) avg_disc, count(*) count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q14_top_revenue" ->
      """WITH rev AS (
        | SELECT o.o_custkey, round(sum(l.l_extendedprice*(1-l.l_discount)),4) revenue,
        |        count(*) n_items
        | FROM lineitem l JOIN orders o ON l.l_orderkey=o.o_orderkey GROUP BY 1)
        |SELECT c.c_custkey, c.c_name, r.revenue, r.n_items
        |FROM rev r JOIN customer c ON r.o_custkey=c.c_custkey
        |ORDER BY revenue DESC, c_custkey LIMIT 10""".stripMargin,
    "q15_region_rollup" ->
      """SELECT r.r_name, n.n_name,
        | round(sum(l.l_extendedprice*(1-l.l_discount)),4) revenue, count(*) n_items
        |FROM lineitem l
        |JOIN supplier s ON l.l_suppkey=s.s_suppkey
        |JOIN nation n ON s.s_nationkey=n.n_nationkey
        |JOIN region r ON n.n_regionkey=r.r_regionkey
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q16_window_topn" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice,4) o_totalprice,
        | CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) rk
        |FROM orders QUALIFY rk <= 3 ORDER BY o_custkey, rk""".stripMargin,
    "q17_semi_anti" ->
      """SELECT c.c_mktsegment, count(*) n_customers
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey=c.c_custkey)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey=c.c_custkey AND o.o_totalprice > 200000.0)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q18_decorrelated_agg" ->
      """WITH a AS (SELECT o_custkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)/count(*) cust_avg
        |  FROM orders GROUP BY 1)
        |SELECT o.o_custkey, count(*) n_above, round(max(o.o_totalprice),4) max_price,
        | round(max(a.cust_avg)*10000)/10000 cust_avg_price
        |FROM orders o JOIN a USING (o_custkey) WHERE o.o_totalprice > a.cust_avg*1.5
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
