package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Extras

/** r37: the schema-generic export normalization (the reference's
  * upload_to_google_sheet edge). The driver gate pins the composed r09
  * frame; this spec pins the per-type rules on a crafted row set where
  * every special value appears — including the fixed-scale decimal
  * rendering that keeps double formatting engine-portable. */
class ExportFormatSpec extends AnyFunSuite {
  import TestSpark._

  test("r37 rules: null/NaN/±inf -> '', dates ISO, doubles fixed-scale, integrals verbatim") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(91.675), Some("note"), Some("2024-03-05")),
      (2L, Some(Double.NaN), None, None),
      (3L, Some(Double.PositiveInfinity), Some(""), Some("2024-12-31")),
      (4L, Some(Double.NegativeInfinity), Some("x"), None),
      (5L, None, Some("y"), Some("2024-01-01")))
      .toDF("id", "v", "note", "d_str")
      .withColumn("d", col("d_str").cast("date")).drop("d_str")
    val got = Extras.exportFormat(df).orderBy(col("id").cast("long"))
      .collect().map(_.toSeq)
    assert(got(0) == Seq("1", "91.6750", "note", "2024-03-05"))
    assert(got(1) == Seq("2", "", "", ""))
    assert(got(2) == Seq("3", "", "", "2024-12-31"))
    assert(got(3) == Seq("4", "", "x", ""))
    assert(got(4) == Seq("5", "", "y", "2024-01-01"))
    // every output column is a string
    assert(Extras.exportFormat(df).schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.StringType))
  }

  test("r37 empty input: empty frame in, empty all-string frame out") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Option[Double], Option[String])].toDF("id", "v", "s")
    val out = Extras.exportFormat(empty)
    assert(out.count() == 0)
    assert(out.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.StringType))
  }

  test("r37 out-of-grid magnitudes render as '', not a saturated number") {
    import spark.implicits._
    // Spark's floor returns LONG: without the magnitude guard, 1e35
    // saturates the grid arithmetic at Long.MaxValue and renders the
    // plausible-but-wrong "922337203685477.6000". At-or-above the grid
    // bound -> '' like +-inf; just inside it still renders.
    val df = Seq(1e35, -1e35, Double.MaxValue,
      Extras.ExportGridMaxAbs, 1e12, 1.5).toDF("v")
    val got = Extras.exportFormat(df).collect().map(_.getString(0)).toSeq
    assert(got == Seq("", "", "", "", "1000000000000.0000", "1.5000"))
    assert(!got.contains(null))
  }

  test("r37 rounding: values land on the 4-decimal half-up grid before rendering") {
    import spark.implicits._
    val df = Seq(0.00005, -0.25, 1234.56785, 2.0).toDF("v")
    val got = Extras.exportFormat(df).collect().map(_.getString(0)).toSeq
    // floor(x*10000+0.5)/10000: 0.00005 -> 0.0001 (half-up), -0.25 exact,
    // 1234.56785 -> 1234.5679 (carried by the double grid), 2.0 -> 2.0000
    assert(got == Seq("0.0001", "-0.2500", "1234.5679", "2.0000"))
  }
}
