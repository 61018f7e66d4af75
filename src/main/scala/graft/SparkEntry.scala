package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.OracleSafe._
import graft.operators.BankEtl
import graft.oracle.BankOracle
import graft.sources.TestData

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] exercises one operator block from SURVEY.md §2
  * (IDs in the name), with a matching DuckDB oracle in [[oracleSql]].
  * Results are fully deterministic: decimal money, explicit ORDER BY,
  * explicit tie-breaks.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q02_agg_groupby")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1/P3/P5: parquet scan with filter + projection pushed into the scan.
    "q01_scan_filter_project" -> { (s, dir) =>
      TestData.lineitem(s, dir)
        .filter(col("l_shipdate") < lit("1997-01-01").cast("timestamp") && col("l_quantity") > 45)
        .select(col("l_orderkey"), col("l_linenumber"), money(col("l_extendedprice")).as("price"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // A4/A5/A7 + P6: partial+final hash aggregation with exact decimal sums.
    "q02_agg_groupby" -> { (s, dir) =>
      TestData.lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(money(col("l_quantity"))).cast("decimal(18,2)").as("sum_qty"),
          sum(money(col("l_extendedprice"))).cast("decimal(18,2)").as("sum_base_price"),
          sum(money(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .cast("decimal(18,2)").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // O2/O3: top-k — Spark plans TakeOrderedAndProject (no full sort at scale).
    "q03_topk" -> { (s, dir) =>
      TestData.lineitem(s, dir)
        .join(TestData.part(s, dir), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(sum(money(col("l_extendedprice"))).cast("decimal(18,2)").as("total_revenue"))
        .orderBy(desc("total_revenue"), asc("p_brand"))
        .limit(5)
    },

    // ---- Bank warehouse (SURVEY.md §2 parity): cleaning J1-J3/P2/P4,
    // dims D1-D12/A1-A3, fact J5-J9, dashboards A4-A6/O1-O3/D14.
    "q20_bank_clean_accounts" -> { (s, dir) =>
      val b = BankEtl.read(s, dir)
      BankEtl.cleanAccounts(b.accounts, b.customers).orderBy("AccountID")
    },
    "q21_bank_clean_customers" -> { (s, dir) =>
      val b = BankEtl.read(s, dir)
      BankEtl.cleanCustomers(b.customers, BankEtl.cleanAccounts(b.accounts, b.customers))
        .orderBy("CustomerID")
    },
    "q22_bank_clean_transactions" -> { (s, dir) =>
      val b = BankEtl.read(s, dir)
      BankEtl.cleanTransactions(b.transactions, BankEtl.cleanAccounts(b.accounts, b.customers))
        .orderBy("TransactionID")
    },
    "q23_dim_customer" -> { (s, dir) =>
      val b = BankEtl.read(s, dir)
      BankEtl.dimCustomer(
        BankEtl.cleanCustomers(b.customers, BankEtl.cleanAccounts(b.accounts, b.customers)))
        .orderBy("Customer_Key")
    },
    "q24_dim_account" -> { (s, dir) =>
      val b = BankEtl.read(s, dir)
      BankEtl.dimAccount(BankEtl.cleanAccounts(b.accounts, b.customers)).orderBy("Account_Key")
    },
    "q25_dim_merchant" -> { (s, dir) =>
      val b = BankEtl.read(s, dir)
      val cls = BankEtl.classified(
        BankEtl.cleanTransactions(b.transactions, BankEtl.cleanAccounts(b.accounts, b.customers)),
        b.mcc)
      BankEtl.dimMerchant(cls).orderBy("Merchant_Key")
    },
    "q26_dim_location" -> { (s, dir) =>
      val b = BankEtl.read(s, dir)
      BankEtl.dimLocation(
        BankEtl.cleanTransactions(b.transactions, BankEtl.cleanAccounts(b.accounts, b.customers)))
        .orderBy("Location_Key")
    },
    "q27_dim_date" -> { (s, dir) =>
      val b = BankEtl.read(s, dir)
      BankEtl.dimDate(
        BankEtl.cleanTransactions(b.transactions, BankEtl.cleanAccounts(b.accounts, b.customers)))
        .orderBy("Date_Key")
    },
    "q28_fact_spending" -> { (s, dir) =>
      BankEtl.build(s, dir, cache = true).fact
        .orderBy("Date_Key", "Customer_Key", "Account_Key", "Merchant_Key",
          "Location_Key", "Amount_Spent")
    },
    "q29_dash_trend" -> { (s, dir) =>
      val w = BankEtl.build(s, dir, cache = true)
      BankEtl.dashTrend(w.fact, w.dimDate)
    },
    "q30_dash_top_categories" -> { (s, dir) =>
      val w = BankEtl.build(s, dir, cache = true)
      BankEtl.dashTopCategories(w.fact, w.dimMerchant)
    },
    "q31_dash_age_groups" -> { (s, dir) =>
      val w = BankEtl.build(s, dir, cache = true)
      BankEtl.dashAgeGroups(w.fact, w.dimCustomer)
    },

    // D7-family probe over the nanosecond-timestamp events table.
    "q60_events_hourly" -> { (s, dir) =>
      TestData.events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(money(col("value"))).cast("decimal(18,2)").as("total_value"))
        .orderBy("hour", "event_type")
    },
  )

  def oracleSql: Map[String, String] = BankOracle.queries ++ Map(
    "q01_scan_filter_project" ->
      s"""SELECT l_orderkey, l_linenumber, ${moneySql("l_extendedprice")} AS price
          FROM lineitem
          WHERE l_shipdate < TIMESTAMP '1997-01-01' AND l_quantity > 45
          ORDER BY l_orderkey, l_linenumber""",

    "q02_agg_groupby" ->
      s"""SELECT l_returnflag, l_linestatus,
                 CAST(SUM(${moneySql("l_quantity")}) AS DECIMAL(18,2)) AS sum_qty,
                 CAST(SUM(${moneySql("l_extendedprice")}) AS DECIMAL(18,2)) AS sum_base_price,
                 CAST(SUM(${moneySql("l_extendedprice * (1.0 - l_discount)")}) AS DECIMAL(18,2)) AS sum_disc_price,
                 COUNT(*) AS count_order
          FROM lineitem
          GROUP BY l_returnflag, l_linestatus
          ORDER BY l_returnflag, l_linestatus""",

    "q03_topk" ->
      s"""SELECT p_brand,
                 CAST(SUM(${moneySql("l_extendedprice")}) AS DECIMAL(18,2)) AS total_revenue
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY p_brand
          ORDER BY total_revenue DESC, p_brand
          LIMIT 5""",

    "q60_events_hourly" ->
      s"""SELECT date_trunc('hour', ts) AS hour, event_type,
                 COUNT(*) AS n,
                 CAST(SUM(${moneySql("value")}) AS DECIMAL(18,2)) AS total_value
          FROM events
          GROUP BY 1, 2
          ORDER BY 1, 2""",
  )
}
