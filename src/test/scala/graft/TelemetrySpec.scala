package graft

import org.scalatest.funsuite.AnyFunSuite

/** r38: the engine-native resource monitor. Values are host-dependent so
  * the driver row is rows-only; this spec pins the structural invariants
  * a shuffling parquet aggregation MUST exhibit — if the listener wiring
  * or the quiescence wait broke, these go to zero. */
class TelemetrySpec extends AnyFunSuite {
  import TestSpark._

  test("r38: a shuffling scan reports jobs, tasks, input and both shuffle sides") {
    val m = Telemetry.telemetryQuery(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m.keySet == Set("n_jobs", "n_stages", "n_tasks", "task_time_ms",
      "gc_time_ms", "input_bytes", "shuffle_read_bytes",
      "shuffle_write_bytes", "peak_exec_memory_bytes"))
    assert(m("n_jobs") >= 1, m.toString)
    assert(m("n_stages") >= 2, "q01's agg needs a map and a reduce stage")
    assert(m("n_tasks") >= 2, m.toString)
    assert(m("input_bytes") > 0, "the parquet scan must report bytes read")
    assert(m("shuffle_write_bytes") > 0, "the partial agg writes the exchange")
    assert(m("shuffle_read_bytes") > 0, "the final agg reads the exchange")
    assert(m("peak_exec_memory_bytes") >= 0)
  }

  test("r38: the listener detaches — a second measurement starts from zero") {
    val a = Telemetry.telemetryQuery(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = Telemetry.telemetryQuery(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // same workload measured twice: if the first listener leaked, the
    // second run would double-count its events
    assert(b("n_jobs") == a("n_jobs"), s"$a vs $b")
    assert(b("n_stages") == a("n_stages"), s"$a vs $b")
  }
}
