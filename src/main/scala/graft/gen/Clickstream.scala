package graft.gen

import java.time.{Instant, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Tables

/** Deterministic synthetic clickstream generator — the Spark-native
  * re-expression of the reference's pandas generator
  * (`generate_clickstream.py:82-266`): delivered orders expand to 5–7
  * purchase-funnel events (page_view → 1–3 view_product → add_to_cart →
  * checkout → purchase), plus non-converting browse sessions of 2–6 events.
  *
  * Determinism: instead of chasing Python RNG bit-streams (SURVEY.md §7
  * hard part b), every "random" choice is a pure multiplicative hash of the
  * driving key — `h(salt, k) = ((k % 1000003 + 1) · 2654435761 + salt ·
  * 40503) mod 1000000007` — so the stream is reproducible from the inputs
  * alone AND expressible verbatim in the DuckDB oracle (plain BIGINT
  * arithmetic, no RNG state anywhere).
  *
  * Shape: a typed `Dataset[FunnelOrder].flatMap` — genuine per-row
  * variable-length row expansion, the one place SURVEY.md §3 calls for the
  * Dataset[T] surface. Scale: the expansion is embarrassingly parallel
  * (no shuffle beyond the input join) and the per-order item list is
  * bounded, so executor memory is O(events per order), never O(orders).
  *
  * Dirt is injected deliberately (the silver layer must have real work to
  * do, reference README.md:464 "Removing duplicates and nulls"):
  *   - every 100th funnel order re-emits its page_view (exact duplicate);
  *   - every 97th browse customer's 2nd event carries an unparseable
  *     timestamp (→ silver's to_timestamp coerces to null → dropped);
  *   - every 53rd browse customer's 1st event has event_type 'bot_probe'
  *     (→ silver's enum validation drops it).
  */
object Clickstream {

  val EventTypes: Seq[String] =
    Seq("page_view", "view_product", "add_to_cart", "checkout", "purchase")
  val Devices: Seq[String] = Seq("mobile", "desktop", "tablet")
  val Sources: Seq[String] = Seq("direct", "search", "social", "email")

  /** Shared hash spec — mirrored literally in the oracle SQL. */
  def h(salt: Long, k: Long): Long =
    ((k % 1000003L + 1L) * 2654435761L + salt * 40503L) % 1000000007L

  final case class FunnelOrder(
      k: Long, custkey: Long, odateSec: Long, items: Seq[Long])

  final case class BrowseCustomer(c: Long)

  /** Bronze-zone event row — all strings/boxed types, exactly what a raw
    * CSV drop carries. `event_ts` is a string (silver casts it, F1);
    * unauthenticated events carry empty-string customer_id (the reference's
    * null-ish key semantic, generate_clickstream.py:99).
    */
  final case class RawEvent(
      event_id: String,
      session_id: String,
      customer_id: String,
      event_type: String,
      event_ts: String,
      product_id: java.lang.Long,
      order_id: java.lang.Long,
      device_type: String,
      traffic_source: String,
      is_authenticated: Int)

  private val tsFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss").withZone(ZoneOffset.UTC)

  private def fmt(epochSec: Long): String =
    tsFmt.format(Instant.ofEpochSecond(epochSec))

  private val browseBaseSec: Long =
    LocalDateTime.parse("1995-06-01T00:00:00").toEpochSecond(ZoneOffset.UTC)

  def funnelEvents(o: FunnelOrder): Seq[RawEvent] = {
    val k = o.k
    val nViews = (1L + h(1, k) % 3L).toInt
    val nEvents = 4 + nViews
    val purchaseSec = o.odateSec + h(2, k) % 86400L
    val device = Devices((h(4, k) % 3L).toInt)
    val source = Sources((h(5, k) % 4L).toInt)
    val isAuth = if (h(6, k) % 10L < 4L) 1 else 0
    val custId = if (isAuth == 1) o.custkey.toString else ""
    val hv = h(3, k)
    val events = (0 until nEvents).map { i =>
      val ts = purchaseSec - 60L * (nEvents - 1 - i)
      val (etype, product, orderId) =
        if (i == 0) ("page_view", null: java.lang.Long, null: java.lang.Long)
        else if (i <= nViews)
          ("view_product",
            java.lang.Long.valueOf(o.items(((hv + i) % o.items.size).toInt)),
            null: java.lang.Long)
        else if (i == nViews + 1)
          ("add_to_cart",
            java.lang.Long.valueOf(o.items((hv % o.items.size).toInt)),
            null: java.lang.Long)
        else if (i == nViews + 2)
          ("checkout", null: java.lang.Long, java.lang.Long.valueOf(k))
        else ("purchase", null: java.lang.Long, java.lang.Long.valueOf(k))
      RawEvent(s"e$k-$i", s"s$k", custId, etype, fmt(ts), product, orderId,
        device, source, isAuth)
    }
    // dirt: duplicate page_view for every 100th order
    if (k % 100L == 0L) events.head +: events else events
  }

  def browseEvents(b: BrowseCustomer): Seq[RawEvent] = {
    val c = b.c
    val steps = (2L + h(7, c) % 5L).toInt
    val baseSec = browseBaseSec + (h(8, c) % 365L) * 86400L + h(9, c) % 86400L
    val device = Devices((h(12, c) % 3L).toInt)
    val source = Sources((h(13, c) % 4L).toInt)
    val isAuth = if (h(14, c) % 10L < 4L) 1 else 0
    val custId = if (isAuth == 1) c.toString else ""
    (0 until steps).map { j =>
      val key = c * 131L + j
      val view = h(10, key) % 2L == 1L
      val etype =
        if (j == 0 && c % 53L == 0L) "bot_probe" // dirt: invalid enum
        else if (view) "view_product"
        else "page_view"
      val ts =
        if (j == 1 && c % 97L == 0L) "not-a-timestamp" // dirt: bad ts
        else fmt(baseSec + 30L * j)
      val product: java.lang.Long =
        if (view) java.lang.Long.valueOf(h(11, key) % 200L + 1L) else null
      RawEvent(s"b$c-$j", s"b$c", custId, etype, ts, product, null,
        device, source, isAuth)
    }
  }

  /** Generate the full raw clickstream for a testdata scale-factor dir:
    * funnel events from 'F'-status orders sampled by `o_orderkey % 20 = 0`
    * (the deterministic analog of the reference's seeded 10k-order cap),
    * plus browse sessions from every 5th customer.
    */
  def generate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // loadParallel: the flatMap row expansion is CPU-heavy and the local
    // single-file scan would otherwise pin it to one partition.
    val orders = Tables.loadParallel(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F" && col("o_orderkey") % 20 === 0)
      .select(col("o_orderkey"), col("o_custkey"),
        unix_timestamp(col("o_orderdate")).as("odateSec"))
    // items per sampled order only — filter before the join so the
    // lineitem side shuffles a 1/20th sample, not the whole fact table.
    val items = Tables.load(spark, dir, "lineitem")
      .join(orders.select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey")
      .agg(sort_array(collect_list(struct(col("l_linenumber"),
        col("l_partkey")))).as("ln"))
      .select(col("l_orderkey"),
        col("ln.l_partkey").as("items"))
    val funnel = orders
      .join(items, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey").as("k"), col("o_custkey").as("custkey"),
        col("odateSec"), col("items"))
      .as[FunnelOrder]
      .flatMap(funnelEvents _)
    val browse = Tables.loadParallel(spark, dir, "customer")
      .filter(col("c_custkey") % 5 === 0)
      .select(col("c_custkey").as("c"))
      .as[BrowseCustomer]
      .flatMap(browseEvents _)
    funnel.union(browse).toDF()
  }
}
