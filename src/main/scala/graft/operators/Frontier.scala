package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Politeness-scheduled crawl frontier — the stage between URL
  * admission ([[Robots.filterAllowed]], [[Urls.decontaminateByDomain]])
  * and the fetcher fleet: a responsible crawler fetches each authority
  * at most once per its declared `Crawl-delay` (the de-facto
  * Bing/Yandex extension [[Robots.parseAll]] reads group-scoped), so
  * the frontier must SEQUENCE each domain's URLs into timed fetch
  * slots while domains schedule independently of each other.
  *
  * Scale shape: one window per domain ordered by id — per-domain
  * sequential slotting IS the semantics of politeness (a domain's
  * fetches cannot parallelize past its delay), and the window is
  * bounded by the per-domain frontier size, which a real pipeline caps
  * upstream anyway ([[Urls.domainCap]] — an uncapped mega-domain is a
  * frontier bug before it is a window-skew bug). Across domains the
  * plan is embarrassingly parallel: one hash shuffle on the domain key,
  * no global sort, no driver state. The robots side joins exactly like
  * [[Robots.verdicts]] (small next to the frontier; AQE broadcasts it
  * when it fits).
  *
  * q178 gates the delay extraction (group precedence, the smallest
  * repeated value, the default for silent/missing robots) and the slot
  * arithmetic against a closed-form DuckDB replay.
  */
object Frontier {

  /** Assign per-domain fetch slots: slot k of a domain fetches at
    * `k * delay(domain)` seconds (relative to the crawl wave's start).
    * `delay` is the agent's group-scoped `Crawl-delay` from the
    * domain's robots.txt, else `defaultDelay` (also for domains with
    * no robots row at all). Slots order by `id` — the caller's
    * priority order (discovery order, PageRank, …). Output:
    * (doc_id, domain, slot, delay, fetch_at). */
  def schedule(urls: DataFrame, id: Column, url: Column,
               robots: DataFrame, domainCol: Column, txtCol: Column,
               agent: String, defaultDelay: Double = 1.0,
               urlKey: Column => Column = Urls.registeredDomain): DataFrame = {
    require(defaultDelay >= 0, "defaultDelay must be non-negative")
    val spark = urls.sparkSession
    import spark.implicits._
    val delayRows = robots
      .select(domainCol.cast("string"), txtCol.cast("string"))
      .as[(String, String)]
      .map { case (dom, txt) =>
        (dom, Robots.delayFor(Robots.parseAll(txt), agent)
          .getOrElse(-1.0))
      }
      .toDF("domain", "__delay")
      // ONE row per domain before the join: a domain whose robots was
      // fetched twice must not duplicate every URL of that domain (the
      // join would fan out). Smallest declared delay wins across
      // fetches (the conservative delayFor convention); min skips the
      // -1 no-declaration marker via the when-null, so a declaring
      // fetch beats a silent one and all-silent stays null → default.
      .groupBy("domain")
      .agg(min(when(col("__delay") >= 0, col("__delay"))).as("__delay"))
    val w = Window.partitionBy("domain").orderBy("doc_id")
    urls.select(id.cast("long").as("doc_id"), urlKey(url).as("domain"))
      .join(delayRows, Seq("domain"), "left")
      .withColumn("delay",
        when(col("__delay").isNotNull && col("__delay") >= 0,
          col("__delay")).otherwise(lit(defaultDelay)))
      .withColumn("slot", (row_number().over(w) - 1).cast("long"))
      .select(col("doc_id"), col("domain"), col("slot"), col("delay"),
        (col("slot") * col("delay")).as("fetch_at"))
  }
}
