package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.OracleSafe.{money, moneySql}

/** Deterministic adapter: driver testdata (TPC-H-ish) → the reference's bank
  * OLTP schema (`data_source/schema.sql:17-50`), so the full reference ETL
  * runs against the harness tables and is DuckDB-oracle-checkable.
  *
  *   customers    ← customer  (synthetic BirthDate/Gender derived from keys)
  *   accounts     ← orders    (OpenDate = o_orderdate)
  *   transactions ← lineitem ⋈ part ⋈ supplier ⋈ nation
  *                  (even line numbers = POS rows with a MerchantName;
  *                   odd = P2P rows with beneficiary + description —
  *                   mirrors the reference's NULL-ness disambiguation,
  *                   `schema.sql:43-48`)
  *   mcc_mapping  ← distinct p_brand (deliberately NOT covering all brands,
  *                  so the classifier's missing-merchant path is exercised)
  *
  * Every derivation is a pure function of integer keys, expressible
  * identically in Spark and DuckDB SQL ([[ctes]]).
  */
object BankAdapter {

  val genders: Seq[String] =
    Seq("Male", "Female", "Agender", "Bigender", "Genderfluid", "Genderqueer", "Polygender")

  /** P2P description pool: covers every classifier branch plus the
    * substring quirks ('an' in "thanh toAN", 'xe' in "XEm", grocery words
    * losing to 'mua', 'nuoc' dual-listing).
    */
  val descriptions: Seq[String] = Seq(
    "an toi voi ban",       // food
    "mua ao khoac moi",     // shopping
    "tien grab di lam",     // transport
    "dong hoc phi ky 1",    // bills
    "du lich da lat",       // entertainment
    "keo cho em be",        // grocery ('gao'-style words trip the 'ao' shopping substring)
    "tra no",               // fallback (no keyword)
    "thanh toan tien cho",  // food via the 'an'-substring quirk
    "mua rau qua gao",      // shopping beats grocery by list order
    "ve xem phim toi nay",  // transport via 'xe' in 'xem' quirk
    "nap the dien thoai",   // bills
    "nuoc khoang lavie",    // food ('nuoc' dual-listed; food wins)
  )

  /** MCC categories assigned to brands by key; same label set the
    * classifier emits.
    */
  val mccCategories: Seq[String] = Seq(
    "Ăn uống & Cà phê", "Mua sắm", "Di chuyển & Vận tải",
    "Hóa đơn & Dịch vụ", "Giải trí & Du lịch", "Tạp hóa & Siêu thị")

  // ---------------------------------------------------------------- Spark

  def customers(spark: SparkSession, dir: String): DataFrame =
    TestData.customer(spark, dir).select(
      col("c_custkey").as("CustomerID"),
      col("c_name").as("FirstName"),
      col("c_mktsegment").as("LastName"),
      date_add(to_date(lit("1950-01-01")), ((col("c_custkey") * 7919) % 25000).cast("int"))
        .as("BirthDate"),
      element_at(array(genders.map(lit): _*), (col("c_custkey") % 7).cast("int") + 1)
        .as("Gender"),
      col("c_mktsegment").as("City"),
      lit("Việt Nam").as("Country"))

  def accounts(spark: SparkSession, dir: String): DataFrame =
    TestData.orders(spark, dir).select(
      col("o_orderkey").as("AccountID"),
      col("o_custkey").as("CustomerID"),
      when(col("o_orderkey") % 2 === 0, "Debit").otherwise("Credit").as("AccountType"),
      col("o_orderdate").as("OpenDate"))

  def transactions(spark: SparkSession, dir: String): DataFrame = {
    val li = TestData.lineitem(spark, dir)
    val isPos: Column = col("l_linenumber") % 2 === 0
    li.join(broadcast(TestData.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .join(broadcast(TestData.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(TestData.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .select(
        // the synthetic lineitem has DUPLICATE (orderkey, linenumber) pairs
        // (linenumber is random, not sequential) — fold part+supplier keys
        // in so the id is unique per source row
        (((col("l_orderkey") * 10 + col("l_linenumber")) * 100000 + col("l_partkey")) * 10000
          + col("l_suppkey")).as("TransactionID"),
        col("l_orderkey").as("AccountID"),
        when(isPos, col("p_brand")).as("MerchantName"),
        money(col("l_extendedprice")).as("Amount"),
        (col("l_shipdate") + expr("make_interval(0, 0, 0, 0, CAST(l_partkey % 24 AS INT), 0, 0)"))
          .as("TransactionTimestamp"),
        when(col("n_name") === "NATION_0", "Việt Nam")
          .when(col("n_name") === "NATION_1", "Vietnam")
          .when(col("n_name") === "NATION_2", "Viet Nam")
          .otherwise(col("n_name")).as("TransactionCountry"),
        when(!isPos, col("s_name")).as("BeneficiaryName"),
        when(!isPos,
          element_at(array(descriptions.map(lit): _*),
            ((col("l_partkey") + col("l_suppkey")) % descriptions.size).cast("int") + 1))
          .as("TransactionDescription"))
  }

  /** Brand digits %4==0 are deliberately absent, so those POS rows take the
    * classifier's missing-merchant path (→ "nan" → food).
    */
  def mccMapping(spark: SparkSession, dir: String): DataFrame =
    TestData.part(spark, dir)
      .select(col("p_brand"), substring(col("p_brand"), 7, 10).cast("int").as("bnum"))
      .distinct()
      .filter(col("bnum") % 4 =!= 0)
      .select(
        col("p_brand").as("MerchantName"),
        element_at(array(mccCategories.map(lit): _*), (col("bnum") % 6).cast("int") + 1)
          .as("Category"))

  // ------------------------------------------------------------ DuckDB SQL

  /** CTE definitions reproducing the adapter in DuckDB SQL, verbatim twins
    * of the Spark readers above. Prepend to oracle queries.
    */
  /** SQL string literal with single quotes doubled, so a future constant
    * containing `'` can't silently break the generated oracle SQL.
    */
  private def sqlLit(s: String): String = s"'${s.replace("'", "''")}'"

  def ctes: String = {
    val genderCase = genders.zipWithIndex
      .map { case (g, i) => s"WHEN $i THEN ${sqlLit(g)}" }
      .mkString("CASE c_custkey % 7 ", " ", " END")
    val descCase = descriptions.zipWithIndex
      .map { case (d, i) => s"WHEN $i THEN ${sqlLit(d)}" }
      .mkString(s"CASE (l_partkey + l_suppkey) % ${descriptions.size} ", " ", " END")
    val mccCase = mccCategories.zipWithIndex
      .map { case (c, i) => s"WHEN $i THEN ${sqlLit(c)}" }
      .mkString("CASE bnum % 6 ", " ", " END")
    s"""bank_customers AS (
       |  SELECT c_custkey AS CustomerID,
       |         c_name AS FirstName,
       |         c_mktsegment AS LastName,
       |         DATE '1950-01-01' + CAST((c_custkey * 7919) % 25000 AS INT) AS BirthDate,
       |         $genderCase AS Gender,
       |         c_mktsegment AS City,
       |         'Việt Nam' AS Country
       |  FROM customer),
       |bank_accounts AS (
       |  SELECT o_orderkey AS AccountID,
       |         o_custkey AS CustomerID,
       |         CASE WHEN o_orderkey % 2 = 0 THEN 'Debit' ELSE 'Credit' END AS AccountType,
       |         o_orderdate AS OpenDate
       |  FROM orders),
       |bank_transactions AS (
       |  SELECT ((l_orderkey * 10 + l_linenumber) * 100000 + l_partkey) * 10000
       |           + l_suppkey AS TransactionID,
       |         l_orderkey AS AccountID,
       |         CASE WHEN l_linenumber % 2 = 0 THEN p_brand END AS MerchantName,
       |         ${moneySql("l_extendedprice")} AS Amount,
       |         l_shipdate + (l_partkey % 24) * INTERVAL '1 hour' AS TransactionTimestamp,
       |         CASE WHEN n_name = 'NATION_0' THEN 'Việt Nam'
       |              WHEN n_name = 'NATION_1' THEN 'Vietnam'
       |              WHEN n_name = 'NATION_2' THEN 'Viet Nam'
       |              ELSE n_name END AS TransactionCountry,
       |         CASE WHEN l_linenumber % 2 = 1 THEN s_name END AS BeneficiaryName,
       |         CASE WHEN l_linenumber % 2 = 1 THEN $descCase END AS TransactionDescription
       |  FROM lineitem
       |  JOIN part ON l_partkey = p_partkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation ON s_nationkey = n_nationkey),
       |bank_mcc AS (
       |  SELECT p_brand AS MerchantName, $mccCase AS Category
       |  FROM (SELECT DISTINCT p_brand, CAST(substring(p_brand, 7) AS INT) AS bnum FROM part)
       |  WHERE bnum % 4 <> 0)""".stripMargin
  }
}
