package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Remaining TPC-H query shapes (SURVEY.md §2 A-rows q30-q40), adapted to
  * this schema (no partsupp / comment / phone / shipmode columns — each
  * adaptation keeps the PLAN shape of the original query, which is what the
  * engine must prove it can run at scale).
  *
  * Float discipline (oracle parity, SURVEY.md §6): every money sum is
  * accumulated as exact integer cents (price cents × (100 − discount
  * hundredths) = ten-thousandths of a dollar) in a BIGINT, so the two
  * engines' different reduction orders cannot diverge; ONE double division
  * + half-up round happens at presentation. The bigint stays exact up to
  * 9.2e18 ten-thousandths ≈ $920 T per group — beyond any 100 TB rollup.
  *
  * Scale notes per query are on each method.
  */
object TpchMore {
  import graft.functions.Money.{cents, tenK}
  /** ten-thousandths → dollars rounded to cents; written EXACTLY as the
    * oracle's floor(s/100.0+0.5)/100.0 (same IEEE ops in the same order —
    * fr(s/10000.0, 2) would compute (s/1e4)*100 which can land 1 ulp away
    * from s/100.0 at a .005 boundary). */
  private def tenK2dollars(s: Column): Column = floor(s / 100.0 + 0.5) / 100.0
  private val tenK2dollarsSql: String => String =
    e => s"floor(($e)/100.0+0.5)/100.0"

  // ---------------------------------------------------------------- q30
  /** Q7 volume-shipping: revenue shipped between two nations, per
    * direction per year. Scale shape: the two nation dims and the
    * nation-FILTERED supplier side broadcast (suppliers of 2 of 25 nations);
    * customers can't broadcast at scale, so the customer leg shuffles on
    * custkey once and lineitem⨝orders shuffles on orderkey once — no other
    * exchange. The nation-pair disjunction prunes AFTER the cheap dim joins
    * (it needs both sides); year rollup is 4 groups, partial-aggregable. */
  val Q30NationA = "NATION_3"
  val Q30NationB = "NATION_7"
  def q30VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nations = Seq(Q30NationA, Q30NationB)
    val supp = broadcast(
      Tables.supplier(spark, dir).select($"s_suppkey", $"s_nationkey")
        .join(broadcast(Tables.nation(spark, dir)
          .filter($"n_name".isin(nations: _*))
          .select($"n_nationkey".as("sn_key"), $"n_name".as("supp_nation"))),
          $"s_nationkey" === $"sn_key"))
    val cust = Tables.customer(spark, dir).select($"c_custkey", $"c_nationkey")
      .join(broadcast(Tables.nation(spark, dir)
        .filter($"n_name".isin(nations: _*))
        .select($"n_nationkey".as("cn_key"), $"n_name".as("cust_nation"))),
        $"c_nationkey" === $"cn_key")
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1997-01-01") && $"l_shipdate" < lit("1999-01-01"))
      .join(supp, $"l_suppkey" === $"s_suppkey")
      .join(Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .filter(($"supp_nation" === Q30NationA && $"cust_nation" === Q30NationB) ||
              ($"supp_nation" === Q30NationB && $"cust_nation" === Q30NationA))
      .select($"supp_nation", $"cust_nation", year($"l_shipdate").as("l_year"),
        tenK($"l_extendedprice", $"l_discount").as("v"))
      .groupBy($"supp_nation", $"cust_nation", $"l_year")
      .agg(tenK2dollars(sum($"v")).as("revenue"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }

  val q30Sql: String =
    s"""WITH vol AS (
       |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |    year(l_shipdate) AS l_year,
       |    CAST(floor(l_extendedprice*100+0.5) AS BIGINT)
       |      * (100 - CAST(floor(l_discount*100+0.5) AS BIGINT)) AS v
       |  FROM lineitem
       |  JOIN supplier ON s_suppkey = l_suppkey
       |  JOIN orders ON o_orderkey = l_orderkey
       |  JOIN customer ON c_custkey = o_custkey
       |  JOIN nation n1 ON n1.n_nationkey = s_nationkey
       |  JOIN nation n2 ON n2.n_nationkey = c_nationkey
       |  WHERE ((n1.n_name = '$Q30NationA' AND n2.n_name = '$Q30NationB')
       |      OR (n1.n_name = '$Q30NationB' AND n2.n_name = '$Q30NationA'))
       |    AND l_shipdate >= TIMESTAMP '1997-01-01'
       |    AND l_shipdate < TIMESTAMP '1999-01-01')
       |SELECT supp_nation, cust_nation, l_year,
       |  ${tenK2dollarsSql("sum(v)")} AS revenue
       |FROM vol GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // ---------------------------------------------------------------- q31
  /** Q13 customer-order distribution: LEFT OUTER join with an extra join
    * predicate (not a WHERE — null-extended customers must survive), count
    * per customer, then a histogram of the counts. Scale shape: one shuffle
    * on custkey for join+first agg (the count groups on the join key, so
    * AQE/codegen keep them in one stage); the histogram agg is ~tens of
    * groups, fully partial-aggregable. */
  def q31CustDist(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .filter($"o_orderpriority" =!= "5-LOW")
      .select($"o_orderkey", $"o_custkey")
    Tables.customer(spark, dir).select($"c_custkey")
      .join(o, $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  val q31Sql: String =
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      |  GROUP BY c_custkey)
      |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin

  // ---------------------------------------------------------------- q32
  /** Q14 promo-revenue share for one ship month: conditional-sum ratio over
    * a broadcast part join. Both sums come out of ONE aggregation; exact
    * integer numerator/denominator, one double division. (The tenK longs
    * convert to double exactly below 9e15 — a month of one part-type at
    * sf0.01 is ~2.5e13; at real scale the division still agrees because
    * both engines convert the same long.) */
  def q32PromoShare(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1998-03-01") && $"l_shipdate" < lit("1998-04-01"))
      .join(broadcast(Tables.part(spark, dir).select($"p_partkey", $"p_type")),
        $"l_partkey" === $"p_partkey")
      .select($"p_type", tenK($"l_extendedprice", $"l_discount").as("v"))
      .agg((floor(lit(100.0) * sum(when($"p_type" === "PROMO", $"v").otherwise(0L))
          / sum($"v") * 10000 + 0.5) / 10000).as("promo_share"))
  }

  val q32Sql: String =
    """SELECT floor(100.0*sum(CASE WHEN p_type='PROMO' THEN v ELSE 0 END)/sum(v)*10000+0.5)/10000 AS promo_share
      |FROM (
      |  SELECT p_type,
      |    CAST(floor(l_extendedprice*100+0.5) AS BIGINT)
      |      * (100 - CAST(floor(l_discount*100+0.5) AS BIGINT)) AS v
      |  FROM lineitem JOIN part ON p_partkey = l_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1998-03-01'
      |    AND l_shipdate < TIMESTAMP '1998-04-01')""".stripMargin

  // ---------------------------------------------------------------- q33
  /** Q16 parts-supplier relationship: distinct supplier count per part
    * descriptor, excluding a NOT-IN supplier set (negative balance stands in
    * for the comment-matched complaints list). Scale shape: the exclusion
    * list broadcasts as a left-anti join (NOT IN with no nulls ≡ anti);
    * count(DISTINCT) re-expressed as distinct-then-count: both levels share
    * the (brand,type,size)-tail shuffle and no Expand appears. */
  def q33PartsSupplier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val excluded = Tables.supplier(spark, dir)
      .filter($"s_acctbal" < 0).select($"s_suppkey")
    Tables.lineitem(spark, dir).select($"l_partkey", $"l_suppkey")
      .join(broadcast(Tables.part(spark, dir)
        .filter($"p_size".isin(1, 14, 23, 45) && $"p_type" =!= "ECONOMY" &&
          $"p_brand" =!= "Brand#4")
        .select($"p_partkey", $"p_brand", $"p_type", $"p_size")),
        $"l_partkey" === $"p_partkey")
      .join(broadcast(excluded), $"l_suppkey" === $"s_suppkey", "left_anti")
      .select($"p_brand", $"p_type", $"p_size", $"l_suppkey").distinct()
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(count(lit(1)).as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
  }

  val q33Sql: String =
    """SELECT p_brand, p_type, p_size, CAST(count(*) AS BIGINT) AS supplier_cnt FROM (
      |  SELECT DISTINCT p_brand, p_type, p_size, l_suppkey
      |  FROM lineitem JOIN part ON p_partkey = l_partkey
      |  WHERE p_size IN (1, 14, 23, 45) AND p_type <> 'ECONOMY'
      |    AND p_brand <> 'Brand#4'
      |    AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0))
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // ---------------------------------------------------------------- q34
  /** Q19 disjunctive predicate revenue: an OR of three (brand, size-range,
    * quantity-range) conjunctions evaluated against a broadcast part join.
    * Scale shape: the disjunction references both sides so it can't reach
    * either scan whole — but each disjunct's single-side conjuncts CAN: the
    * part filter (brand ∈ {..} AND size ≤ 15) and the lineitem filter
    * (quantity ≤ 30) are pre-applied, shrinking the broadcast and the scan
    * before the residual OR runs. */
  def q34Disjunctive(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = broadcast(Tables.part(spark, dir)
      .filter($"p_brand".isin("Brand#2", "Brand#8", "Brand#17") && $"p_size" <= 15)
      .select($"p_partkey", $"p_brand", $"p_size"))
    Tables.lineitem(spark, dir)
      .filter($"l_quantity" >= 1 && $"l_quantity" <= 30)
      .join(p, $"l_partkey" === $"p_partkey")
      .filter(
        ($"p_brand" === "Brand#2" && $"p_size".between(1, 5) && $"l_quantity".between(1, 11)) ||
        ($"p_brand" === "Brand#8" && $"p_size".between(1, 10) && $"l_quantity".between(10, 20)) ||
        ($"p_brand" === "Brand#17" && $"p_size".between(1, 15) && $"l_quantity".between(20, 30)))
      .agg(tenK2dollars(sum(tenK($"l_extendedprice", $"l_discount"))).as("revenue"))
  }

  val q34Sql: String =
    s"""SELECT ${tenK2dollarsSql("sum(v)")} AS revenue FROM (
       |  SELECT CAST(floor(l_extendedprice*100+0.5) AS BIGINT)
       |      * (100 - CAST(floor(l_discount*100+0.5) AS BIGINT)) AS v
       |  FROM lineitem JOIN part ON p_partkey = l_partkey
       |  WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
       |     OR (p_brand = 'Brand#8' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
       |     OR (p_brand = 'Brand#17' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30))""".stripMargin

  // ---------------------------------------------------------------- q35
  /** Q22 global-sales-opportunity: rich inactive customers per country
    * code. cntrycode := c_nationkey % 10 (no phone column); "never ordered"
    * is vacuous here (every customer has orders) so the anti-join keys on
    * RECENT orders — same plan shape, non-degenerate output. Scale shape:
    * the positive-balance average is a 1-row aggregate broadcast into the
    * filter (no driver action); the anti join shuffles on custkey but the
    * orders side is date-pruned at the scan first. */
  val Q35Cutoff = "2000-07-01"
  def q35GlobalSales(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val codes = Seq(1, 3, 5, 7, 9)
    val cust = Tables.customer(spark, dir)
      .filter(($"c_nationkey" % 10).isin(codes: _*))
      .select($"c_custkey", ($"c_nationkey" % 10).as("cntrycode"),
        cents($"c_acctbal").as("bal_cents"), $"c_acctbal")
    val avgPos = cust.filter($"c_acctbal" > 0)
      .agg((sum($"bal_cents").cast("double") / count(lit(1))).as("avg_cents"))
    val recent = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit(Q35Cutoff)).select($"o_custkey")
    cust
      .crossJoin(broadcast(avgPos))
      .filter($"bal_cents".cast("double") > $"avg_cents")
      .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"cntrycode")
      .agg(count(lit(1)).as("numcust"),
        (floor(sum($"bal_cents") / 100.0 * 100 + 0.5) / 100).as("totacctbal"))
      .orderBy($"cntrycode")
  }

  val q35Sql: String =
    s"""WITH pos AS (
       |  SELECT CAST(sum(CAST(floor(c_acctbal*100+0.5) AS BIGINT)) AS DOUBLE)/count(*) AS avg_cents
       |  FROM customer WHERE c_acctbal > 0 AND (c_nationkey % 10) IN (1,3,5,7,9))
       |SELECT (c_nationkey % 10) AS cntrycode, CAST(count(*) AS BIGINT) AS numcust,
       |  floor(sum(CAST(floor(c_acctbal*100+0.5) AS BIGINT))/100.0*100+0.5)/100 AS totacctbal
       |FROM customer, pos
       |WHERE (c_nationkey % 10) IN (1,3,5,7,9)
       |  AND CAST(CAST(floor(c_acctbal*100+0.5) AS BIGINT) AS DOUBLE) > avg_cents
       |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
       |                  AND o_orderdate >= TIMESTAMP '$Q35Cutoff')
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q36
  /** Q10 returned-item reporting: top-20 customers by revenue lost to
    * returns in a quarter. Scale shape: orders date-pruned at the scan
    * before the orderkey shuffle; nation broadcasts; the top-k orders on the
    * EXACT bigint sum (ties broken by custkey — float row-order can't flip
    * the cut) and is a TakeOrdered, not a global sort. */
  def q36ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1998-01-01") && $"o_orderdate" < lit("1998-04-01"))
      .select($"o_orderkey", $"o_custkey")
    Tables.lineitem(spark, dir)
      .filter($"l_returnflag" === "R")
      .join(o, $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, dir)
        .select($"c_custkey", $"c_name", $"c_acctbal", $"c_nationkey"),
        $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(spark, dir).select($"n_nationkey", $"n_name")),
        $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
      .agg(sum(tenK($"l_extendedprice", $"l_discount")).as("sum_v"))
      .orderBy($"sum_v".desc, $"c_custkey")
      .limit(20)
      .select($"c_custkey", $"c_name", tenK2dollars($"sum_v").as("revenue"),
        $"c_acctbal", $"n_name")
  }

  val q36Sql: String =
    s"""SELECT c_custkey, c_name, ${tenK2dollarsSql("sum(v)")} AS revenue, c_acctbal, n_name
       |FROM (
       |  SELECT c_custkey, c_name, c_acctbal, n_name,
       |    CAST(floor(l_extendedprice*100+0.5) AS BIGINT)
       |      * (100 - CAST(floor(l_discount*100+0.5) AS BIGINT)) AS v
       |  FROM customer
       |  JOIN orders ON c_custkey = o_custkey
       |  JOIN lineitem ON l_orderkey = o_orderkey
       |  JOIN nation ON n_nationkey = c_nationkey
       |  WHERE o_orderdate >= TIMESTAMP '1998-01-01'
       |    AND o_orderdate < TIMESTAMP '1998-04-01' AND l_returnflag = 'R')
       |GROUP BY c_custkey, c_name, c_acctbal, n_name
       |ORDER BY sum(v) DESC, c_custkey LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q37
  /** Q15 top supplier: supplier(s) whose quarterly revenue equals the
    * maximum (the view + scalar-subquery formulation). Scale shape: one
    * suppkey aggregation; the max is a 1-row aggregate of THAT result
    * broadcast back (no second scan of lineitem, no window over all
    * suppliers); equality on the exact bigint keeps ties engine-stable. */
  def q37TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rev = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1998-01-01") && $"l_shipdate" < lit("1998-04-01"))
      .groupBy($"l_suppkey")
      .agg(sum(tenK($"l_extendedprice", $"l_discount")).as("r"))
    val mx = rev.agg(max($"r").as("mr"))
    rev.crossJoin(broadcast(mx)).filter($"r" === $"mr")
      .join(broadcast(Tables.supplier(spark, dir).select($"s_suppkey", $"s_name")),
        $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", tenK2dollars($"r").as("total_revenue"))
      .orderBy($"s_suppkey")
  }

  val q37Sql: String =
    s"""WITH rev AS (
       |  SELECT l_suppkey,
       |    sum(CAST(floor(l_extendedprice*100+0.5) AS BIGINT)
       |      * (100 - CAST(floor(l_discount*100+0.5) AS BIGINT))) AS r
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1998-01-01'
       |    AND l_shipdate < TIMESTAMP '1998-04-01'
       |  GROUP BY 1),
       |mx AS (SELECT max(r) AS mr FROM rev)
       |SELECT s_suppkey, s_name, ${tenK2dollarsSql("r")} AS total_revenue
       |FROM rev, mx JOIN supplier ON s_suppkey = l_suppkey
       |WHERE r = mr ORDER BY s_suppkey""".stripMargin

  // ---------------------------------------------------------------- q38
  /** Q9 product-type profit by nation × year. No partsupp/supplycost in
    * this schema: cost := 60% of retail price × quantity, which preserves
    * the shape (a per-part cost factor joined into the revenue expression).
    * amount stays exact integer ten-thousandths (retail cents × integer
    * qty × 60). Scale shape: part is name-filtered BEFORE broadcast;
    * supplier+nation broadcast; lineitem⨝orders is the only fact-fact
    * shuffle; the rollup is nations × years, partial-aggregable. */
  def q38NationProfit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = broadcast(Tables.part(spark, dir)
      .filter($"p_name".like("%gear%"))
      .select($"p_partkey", cents($"p_retailprice").as("retail_cents")))
    Tables.lineitem(spark, dir)
      .join(p, $"l_partkey" === $"p_partkey")
      .join(broadcast(Tables.supplier(spark, dir).select($"s_suppkey", $"s_nationkey")),
        $"l_suppkey" === $"s_suppkey")
      .join(broadcast(Tables.nation(spark, dir).select($"n_nationkey", $"n_name")),
        $"s_nationkey" === $"n_nationkey")
      .join(Tables.orders(spark, dir).select($"o_orderkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .select($"n_name".as("nation"), year($"o_orderdate").as("o_year"),
        (tenK($"l_extendedprice", $"l_discount") -
          $"retail_cents" * floor($"l_quantity" + 0.5).cast("long") * 60L).as("amount"))
      .groupBy($"nation", $"o_year")
      .agg(tenK2dollars(sum($"amount")).as("sum_profit"))
      .orderBy($"nation", $"o_year".desc)
  }

  val q38Sql: String =
    s"""SELECT nation, o_year, ${tenK2dollarsSql("sum(amount)")} AS sum_profit FROM (
       |  SELECT n_name AS nation, year(o_orderdate) AS o_year,
       |    CAST(floor(l_extendedprice*100+0.5) AS BIGINT)
       |      * (100 - CAST(floor(l_discount*100+0.5) AS BIGINT))
       |    - CAST(floor(p_retailprice*100+0.5) AS BIGINT)
       |      * CAST(floor(l_quantity+0.5) AS BIGINT) * 60 AS amount
       |  FROM lineitem
       |  JOIN part ON p_partkey = l_partkey
       |  JOIN supplier ON s_suppkey = l_suppkey
       |  JOIN nation ON n_nationkey = s_nationkey
       |  JOIN orders ON o_orderkey = l_orderkey
       |  WHERE p_name LIKE '%gear%')
       |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin

  // ---------------------------------------------------------------- q39
  /** Q20 potential-part-promotion: suppliers who shipped a large volume of
    * PROMO parts in a year (the partsupp availability threshold becomes a
    * shipped-quantity threshold — same agg→semi-join shape). Scale shape:
    * type-filtered part broadcasts; the qty rollup groups on suppkey; the
    * qualifying-supplier set (≤ |suppliers|) broadcasts into a left-semi
    * join against the supplier dim; nation broadcast for the name. */
  val Q39MinQty = 400L
  def q39PromoSuppliers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val qualifying = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1998-01-01") && $"l_shipdate" < lit("1999-01-01"))
      .join(broadcast(Tables.part(spark, dir)
        .filter($"p_type" === "PROMO").select($"p_partkey")),
        $"l_partkey" === $"p_partkey")
      .groupBy($"l_suppkey")
      .agg(sum(floor($"l_quantity" + 0.5).cast("long")).as("qty"))
      .filter($"qty" > Q39MinQty)
      .select($"l_suppkey")
    Tables.supplier(spark, dir)
      .join(broadcast(qualifying), $"s_suppkey" === $"l_suppkey", "left_semi")
      .join(broadcast(Tables.nation(spark, dir).select($"n_nationkey", $"n_name")),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_name", $"n_name")
      .orderBy($"s_name")
  }

  val q39Sql: String =
    s"""SELECT s_name, n_name
       |FROM supplier JOIN nation ON n_nationkey = s_nationkey
       |WHERE s_suppkey IN (
       |  SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
       |  WHERE p_type = 'PROMO'
       |    AND l_shipdate >= TIMESTAMP '1998-01-01'
       |    AND l_shipdate < TIMESTAMP '1999-01-01'
       |  GROUP BY l_suppkey
       |  HAVING sum(CAST(floor(l_quantity+0.5) AS BIGINT)) > $Q39MinQty)
       |ORDER BY s_name""".stripMargin

  // ---------------------------------------------------------------- q40
  /** Q12 shipping-mode priority classes (linestatus stands in for the
    * absent shipmode column): late lines in a year, split into high/low
    * priority counts per class. Scale shape: the lateness predicate is a
    * per-row comparison AFTER the orderkey join (it references both
    * sides); the ship-year filter prunes lineitem at the scan; the final
    * agg is 2 groups with CASE-sum partials — no distinct, no window. */
  val Q40LateDays = 60
  def q40LateByClass(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val high = $"o_orderpriority".isin("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1998-01-01") && $"l_shipdate" < lit("1999-01-01"))
      .select($"l_orderkey", $"l_shipdate", $"l_linestatus")
      .join(Tables.orders(spark, dir)
        .select($"o_orderkey", $"o_orderdate", $"o_orderpriority"),
        $"l_orderkey" === $"o_orderkey")
      .filter($"l_shipdate" > $"o_orderdate" + expr(s"INTERVAL $Q40LateDays DAYS"))
      .groupBy($"l_linestatus")
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy($"l_linestatus")
  }

  val q40Sql: String =
    s"""SELECT l_linestatus,
       |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
       |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |WHERE l_shipdate > o_orderdate + INTERVAL $Q40LateDays DAY
       |  AND l_shipdate >= TIMESTAMP '1998-01-01'
       |  AND l_shipdate < TIMESTAMP '1999-01-01'
       |GROUP BY 1 ORDER BY 1""".stripMargin
}
