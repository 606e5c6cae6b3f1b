package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.TimeSeries

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("resampleLinear interpolates between bracketing events") {
    // events at :00 (v=10) and :40 (v=70); 600s grid -> :00,:10,:20,:30,:40
    val df = Seq(("a", ts("2024-01-01 00:00:00"), 10.0),
      ("a", ts("2024-01-01 00:40:00"), 70.0)).toDF("k", "ts", "v")
    val out = rows(TimeSeries.resampleLinear(df, "k", "ts", "v", 600)
      .select("interp").orderBy("grid_ts")).flatten
    assert(out == Seq(10.0, 25.0, 40.0, 55.0, 70.0))
  }

  test("resampleLinear: exact event hit wins; no extrapolation outside") {
    // first event off-grid: the grid point before it has no prev -> null
    val df = Seq(("a", ts("2024-01-01 00:05:00"), 50.0),
      ("a", ts("2024-01-01 00:15:00"), 100.0)).toDF("k", "ts", "v")
    val out = rows(TimeSeries.resampleLinear(df, "k", "ts", "v", 600)
      .select("interp").orderBy("grid_ts")).flatten
    // grid 00:00 (before first event -> null), 00:10 (midpoint -> 75)
    assert(out == Seq(null, 75.0))
  }

  test("resampleLinear drops half-null events instead of desyncing pairs") {
    // the null-value event at 00:05 must not advance prev_t without
    // advancing prev_v: interpolation sees only the two complete events
    val df = Seq(
      ("a", Some(ts("2024-01-01 00:00:00")), Some(10.0)),
      ("a", Some(ts("2024-01-01 00:05:00")), None),
      ("a", None, Some(999.0)),
      ("a", Some(ts("2024-01-01 00:10:00")), Some(30.0)))
      .toDF("k", "ts", "v")
    val out = rows(TimeSeries.resampleLinear(df, "k", "ts", "v", 300)
      .select("interp").orderBy("grid_ts")).flatten
    assert(out == Seq(10.0, 20.0, 30.0))
  }

  test("resampleLinear keys interpolate independently") {
    val df = Seq(("a", ts("2024-01-01 00:00:00"), 0.0),
      ("a", ts("2024-01-01 00:10:00"), 10.0),
      ("b", ts("2024-01-01 00:00:00"), 100.0),
      ("b", ts("2024-01-01 00:10:00"), 0.0)).toDF("k", "ts", "v")
    val out = TimeSeries.resampleLinear(df, "k", "ts", "v", 300)
    val a = rows(out.filter($"k" === "a").select("interp").orderBy("grid_ts")).flatten
    val b = rows(out.filter($"k" === "b").select("interp").orderBy("grid_ts")).flatten
    assert(a == Seq(0.0, 5.0, 10.0))
    assert(b == Seq(100.0, 50.0, 0.0))
  }
}
