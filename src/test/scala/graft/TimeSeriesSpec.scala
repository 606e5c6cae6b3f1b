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

  test("holtLinear runs the level/trend recurrence (hand-checked)") {
    val df = Seq(
      ("u", ts("2024-01-01 00:00:00"), 10.0),
      ("u", ts("2024-01-01 00:01:00"), 12.0),
      ("u", ts("2024-01-01 00:02:00"), 14.0),
      ("s", ts("2024-01-01 00:00:00"), 5.0)).toDF("k", "ts", "v")
    val out = rows(TimeSeries.holtLinear(df, "k", Seq($"ts".asc), "v",
      alpha = 0.5, beta = 0.5).orderBy("k"))
    // single point: level = y1, trend = 0, forecast = y1
    assert(out.head == Seq("s", 1L, 5.0, 0.0, 5.0))
    // u: l1=10,b1=0; l2=.5*12+.5*10=11, b2=.5*(11-10)=0.5;
    //    l3=.5*14+.5*11.5=12.75, b3=.5*(12.75-11)+.5*.5=1.125
    val Seq(_, n, l, b, f) = out(1)
    assert(n == 3L && l == 12.75 && b == 1.125 && f == 13.875)
  }

  test("holtLinear fails loudly on a key above maxObs instead of collecting it") {
    val pts = (1 to 50).map(i => ("hot", ts(f"2024-01-01 00:${i % 60}%02d:00"),
      1.0 * i))
    val ex = intercept[Exception] {
      TimeSeries.holtLinear(pts.toDF("k", "ts", "v"), "k",
        Seq($"ts".asc), "v", alpha = 0.5, beta = 0.5, maxObs = 10).collect()
    }
    // raise_error surfaces as a SparkRuntimeException naming key + count
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: msgs(t.getCause)
    assert(msgs(ex).exists(m => m != null && m.contains("holtLinear") &&
      m.contains("hot") && m.contains("maxObs=10")), s"got: ${msgs(ex)}")
    // and a key at exactly maxObs still computes
    val ok = TimeSeries.holtLinear(pts.toDF("k", "ts", "v"), "k",
      Seq($"ts".asc), "v", alpha = 0.5, beta = 0.5, maxObs = 50)
    assert(ok.count() == 1L)
  }

  test("holtLinear tracks a perfect linear series exactly in the limit") {
    // alpha, beta near 1 -> level ~ last value, trend ~ last diff
    val pts = (1 to 20).map(i => ("k", ts(f"2024-01-01 00:${i}%02d:00"),
      3.0 * i))
    val out = rows(TimeSeries.holtLinear(pts.toDF("k", "ts", "v"), "k",
      Seq($"ts".asc), "v", alpha = 0.9, beta = 0.9))
    val Seq(Seq(_, _, l, b, f)) = out
    assert(math.abs(l.asInstanceOf[Double] - 60.0) < 0.1)
    assert(math.abs(b.asInstanceOf[Double] - 3.0) < 0.1)
    assert(math.abs(f.asInstanceOf[Double] - 63.0) < 0.2)
  }
}
