package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Scans, filters, and joins — SURVEY.md §2.2 Q01-Q20.
  *
  * ES-6.3 query-DSL analogs (match_all / ids / bool / term / range /
  * prefix / wildcard / exists / terms) re-expressed as declarative
  * DataFrame plans so Catalyst pushes predicates and prunes columns into
  * the parquet scan, and picks join strategies (broadcast for dims, SMJ
  * for fact-fact) — verified by plan-shape tests.
  */
object Relational {

  private def T(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  val entries: Seq[Entry] = Seq(

    // ---- scans / sources (Q01-Q04) ----
    Entry("q01_scan",
      "SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber") { (s, d) =>
      T(s, d, "lineitem").orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    Entry("q02_lookup",
      "SELECT * FROM orders WHERE o_orderkey = 42") { (s, d) =>
      T(s, d, "orders").filter(col("o_orderkey") === 42)
    },

    Entry("q04_roundtrip",
      "SELECT COUNT(*) AS n FROM lineitem") { (s, d) =>
      // source-connector check: parquet -> json -> count parity
      val tmp = java.nio.file.Files.createTempDirectory("graft_json").toString
      T(s, d, "lineitem").write.mode("overwrite").json(tmp)
      s.read.json(tmp).select(count(lit(1)).as("n"))
    },

    // ---- projections / predicates (Q05-Q11) ----
    Entry("q05_project",
      "SELECT l_orderkey, l_extendedprice FROM lineitem ORDER BY l_orderkey, l_extendedprice, l_linenumber") { (s, d) =>
      // l_linenumber only breaks ties deterministically; prune it from output
      T(s, d, "lineitem")
        .orderBy(col("l_orderkey"), col("l_extendedprice"), col("l_linenumber"))
        .select(col("l_orderkey"), col("l_extendedprice"))
    },

    Entry("q06_term",
      "SELECT COUNT(*) AS n FROM orders WHERE o_orderstatus = 'F'") { (s, d) =>
      T(s, d, "orders").filter(col("o_orderstatus") === "F").agg(count(lit(1)).as("n"))
    },

    Entry("q07_range",
      "SELECT COUNT(*) AS n FROM lineitem WHERE l_quantity BETWEEN 10 AND 20") { (s, d) =>
      T(s, d, "lineitem").filter(col("l_quantity").between(10, 20)).agg(count(lit(1)).as("n"))
    },

    Entry("q08_bool",
      """SELECT COUNT(*) AS n FROM lineitem
        |WHERE l_discount > 0.05 AND (l_returnflag = 'R' OR l_tax < 0.02)
        |  AND NOT l_linestatus = 'O'""".stripMargin) { (s, d) =>
      T(s, d, "lineitem").filter(
        col("l_discount") > 0.05 &&
        (col("l_returnflag") === "R" || col("l_tax") < 0.02) &&
        !(col("l_linestatus") === "O")).agg(count(lit(1)).as("n"))
    },

    Entry("q09_like",
      """SELECT
        |  COUNT(*) FILTER (WHERE p_name LIKE 's%') AS n_prefix,
        |  COUNT(*) FILTER (WHERE p_type LIKE '%ROMO%') AS n_wild,
        |  COUNT(*) FILTER (WHERE regexp_matches(p_name, '^(red|blue) ')) AS n_regex
        |FROM part""".stripMargin) { (s, d) =>
      T(s, d, "part").agg(
        count(when(col("p_name").startsWith("s"), 1)).as("n_prefix"),
        count(when(col("p_type").like("%ROMO%"), 1)).as("n_wild"),
        count(when(col("p_name").rlike("^(red|blue) "), 1)).as("n_regex"))
    },

    Entry("q10_exists",
      "SELECT COUNT(*) FILTER (WHERE props IS NOT NULL) AS n_present, COUNT(*) FILTER (WHERE props IS NULL) AS n_missing FROM events") { (s, d) =>
      T(s, d, "events").agg(
        count(when(col("props").isNotNull, 1)).as("n_present"),
        count(when(col("props").isNull, 1)).as("n_missing"))
    },

    Entry("q11_in_set",
      "SELECT COUNT(*) AS n FROM nation WHERE n_regionkey IN (0, 2, 4)") { (s, d) =>
      T(s, d, "nation").filter(col("n_regionkey").isin(0, 2, 4)).agg(count(lit(1)).as("n"))
    },

    // ---- joins (Q12-Q20) ----
    Entry("q12_inner_join",
      "SELECT o_orderkey, c_name FROM orders JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey") { (s, d) =>
      T(s, d, "orders").join(T(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_name")).orderBy(col("o_orderkey"))
    },

    Entry("q13_broadcast_join",
      "SELECT p_brand, COUNT(*) AS n FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand ORDER BY p_brand") { (s, d) =>
      // part is the small dim: explicit broadcast keeps the fact table
      // shuffle-free — at 100 TB the only viable plan for this join.
      T(s, d, "lineitem").join(broadcast(T(s, d, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand")).agg(count(lit(1)).as("n")).orderBy(col("p_brand"))
    },

    Entry("q14_left_join",
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin) { (s, d) =>
      T(s, d, "customer").join(T(s, d, "orders"), col("o_custkey") === col("c_custkey"), "left")
        .groupBy(col("c_custkey")).agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_custkey"))
    },

    Entry("q14_full_join",
      """SELECT n_nationkey, n_name, s_suppkey
        |FROM nation FULL JOIN supplier ON s_nationkey = n_nationkey
        |ORDER BY n_nationkey NULLS FIRST, s_suppkey NULLS FIRST""".stripMargin) { (s, d) =>
      T(s, d, "nation").join(T(s, d, "supplier"), col("s_nationkey") === col("n_nationkey"), "full")
        .select(col("n_nationkey"), col("n_name"), col("s_suppkey"))
        .orderBy(col("n_nationkey").asc_nulls_first, col("s_suppkey").asc_nulls_first)
    },

    Entry("q15_semi_join",
      "SELECT c_custkey FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey") { (s, d) =>
      T(s, d, "customer").join(T(s, d, "orders"), col("o_custkey") === col("c_custkey"), "left_semi")
        .select(col("c_custkey")).orderBy(col("c_custkey"))
    },

    Entry("q15_anti_join",
      "SELECT c_custkey FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey") { (s, d) =>
      T(s, d, "customer").join(T(s, d, "orders"), col("o_custkey") === col("c_custkey"), "left_anti")
        .select(col("c_custkey")).orderBy(col("c_custkey"))
    },

    Entry("q16_theta_join",
      "SELECT COUNT(*) AS n FROM part p JOIN supplier s ON p.p_size > s.s_suppkey") { (s, d) =>
      // non-equi -> BNLJ with the small side broadcast
      T(s, d, "part").join(broadcast(T(s, d, "supplier")), col("p_size") > col("s_suppkey"))
        .agg(count(lit(1)).as("n"))
    },

    Entry("q17_asof_join",
      """SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
        |  (SELECT c.event_id FROM events c
        |   WHERE c.event_type = 'click' AND c.user_id = p.user_id AND c.ts <= p.ts
        |   ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS click_id
        |FROM events p WHERE p.event_type = 'purchase' ORDER BY p.event_id""".stripMargin) { (s, d) =>
      // As-of join, scalably: union both sides, one window pass carrying the
      // last click forward — a single shuffle on user_id, no row explosion
      // (vs. the O(clicks x purchases) join+rank naive plan).
      import org.apache.spark.sql.expressions.Window
      val e = T(s, d, "events")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), lit(0).as("kind"),
                col("event_id"), col("event_id").as("click_id"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(1).as("kind"),
                col("event_id"), lit(null).cast("long").as("click_id"))
      // kind=0 sorts clicks before purchases at equal ts (<= semantics);
      // event_id breaks remaining ties (latest click wins).
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("kind"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      clicks.unionByName(purchases)
        .withColumn("asof", last(col("click_id"), ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        .select(col("event_id"), col("user_id"),
                unix_micros(col("ts")).as("ts_us"), col("asof").as("click_id"))
        .orderBy(col("event_id"))
    }.sqlTwin(
      // structural gap: the oracle's correlated ORDER BY + LIMIT 1 scalar
      // subquery — Spark wants an aggregated scalar subquery (max_by over
      // the same (ts, event_id) order)
      """SELECT p.event_id, p.user_id, unix_micros(p.ts) AS ts_us,
        |  (SELECT max_by(c.event_id, struct(c.ts, c.event_id)) FROM events c
        |   WHERE c.event_type = 'click' AND c.user_id = p.user_id AND c.ts <= p.ts) AS click_id
        |FROM events p WHERE p.event_type = 'purchase' ORDER BY p.event_id""".stripMargin),

    Entry("q18_interval_join",
      """SELECT e1.event_id, COUNT(*) AS n FROM events e1 JOIN events e2
        |ON e2.user_id = e1.user_id AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 1 HOUR
        |WHERE e1.event_type = 'purchase' GROUP BY e1.event_id ORDER BY e1.event_id""".stripMargin) { (s, d) =>
      // Banded join with a coarse time-bucket equi key: the band width is
      // 1 h, so bucketing ts by the hour means each probe row matches
      // exactly two buckets (its own and the next). The shuffle key becomes
      // (user_id, hour) — a single user's multi-year history spreads over
      // time instead of landing on one reducer, and the per-key cross
      // product is bounded by events-per-user-per-2h. The band predicate
      // stays as the post-join filter for exactness.
      val e = T(s, d, "events")
      val bucket1h = (c: Column) => floor(unix_timestamp(c) / 3600L)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id").as("u1"), col("ts").as("t1"),
                explode(array(bucket1h(col("ts")), bucket1h(col("ts")) + 1)).as("bk"))
      val others = e.select(col("user_id").as("u2"), col("ts").as("t2"),
                            bucket1h(col("ts")).as("bk"))
      purchases.as("p").join(others.as("o"),
          col("u2") === col("u1") && col("p.bk") === col("o.bk") &&
          col("t2") > col("t1") && col("t2") <= col("t1") + expr("INTERVAL 1 HOUR"))
        .groupBy(col("event_id")).agg(count(lit(1)).as("n"))
        .orderBy(col("event_id"))
    },

    Entry("q19_cross_join",
      "SELECT COUNT(*) AS n FROM region CROSS JOIN nation") { (s, d) =>
      T(s, d, "region").crossJoin(T(s, d, "nation")).agg(count(lit(1)).as("n"))
    },

    Entry("q20_join5",
      """SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin) { (s, d) =>
      // TPC-H Q5 shape: fact-fact joins shuffle on their keys, all dims
      // broadcast; region filter prunes before the join (Catalyst pushes it).
      val lineitem = T(s, d, "lineitem")
      val orders = T(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val out = lineitem
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(T(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(T(s, d, "supplier")),
              col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(T(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(T(s, d, "region")),
              col("n_regionkey") === col("r_regionkey") && col("r_name") === "ASIA")
      out.groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // ES sliced scroll: a full-table export split into n disjoint slices a
    // client consumes in parallel (slice i of n = hash(id) % n == i). The
    // slice function is a deterministic multiplicative hash (Knuth's
    // 2654435761) computed identically in both engines — NOT Spark's
    // murmur3 `hash()`, which DuckDB can't replay. The result proves the
    // slicing is a partition of the table (per-slice row counts + an
    // order-insensitive checksum): at 100 TB each slice is an independent
    // pushed-down scan (`WHERE slice_of(id) = i` folds into the row filter),
    // so n export clients never coordinate — the exact ES sliced-scroll
    // contract. Products stay in int64: max orderkey (~6M at sf1) times
    // the multiplier is ~1.6e16, well under 2^63.
    Entry("q168_sliced_scan",
      """SELECT CAST((l_orderkey * 2654435761) % 4 AS INT) AS slice,
        |  COUNT(*) AS n,
        |  CAST(SUM(l_orderkey * l_linenumber) AS BIGINT) AS checksum
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      T(s, d, "lineitem")
        .groupBy(((col("l_orderkey") * lit(2654435761L)) % 4).cast("int").as("slice"))
        .agg(count(lit(1)).as("n"),
             sum(col("l_orderkey") * col("l_linenumber")).cast("bigint").as("checksum"))
        .orderBy(col("slice"))
    },

    // ES _mget: fetch a BATCH of documents by id, results in REQUEST
    // order (the ids array's order, duplicates included — the mget
    // contract; position 1..n is the response index). The request rides
    // as a literal inline table joined on doc_id: at 100 TB the id list
    // broadcasts and the probe is an id-pushed scan (PushedFilters via
    // the join's dynamic filter / a literal isin), never a full pass per
    // id. VALUES is dialect-shared, so one SQL serves both engines.
    Entry("q176_mget",
      """SELECT t.i, d.doc_id, d.lang, d.source, CAST(d.n_chars AS BIGINT) AS n_chars
        |FROM (VALUES (1, 7), (2, 3), (3, 11), (4, 3)) AS t(i, id)
        |JOIN documents d ON d.doc_id = t.id
        |ORDER BY t.i""".stripMargin) { (s, d) =>
      import s.implicits._
      val req = Seq((1, 7L), (2, 3L), (3, 11L), (4, 3L)).toDF("i", "id")
      T(s, d, "documents")
        .join(broadcast(req), col("doc_id") === col("id"))
        .select(col("i"), col("doc_id"), col("lang"), col("source"),
                col("n_chars").cast("bigint").as("n_chars"))
        .orderBy(col("i"))
    },

    // ES _msearch: several independent searches in one request, each
    // response block tagged by its request index. Two sub-searches over
    // documents (a term query and a metadata filter), each with its own
    // deterministic top-5, UNION ALL'd with a search_idx discriminator —
    // in Spark each arm stays an independent pushed-down scan + local
    // top-k (TakeOrdered), and the union is plan-level concatenation,
    // not a join; arms prune to their own columns/predicates exactly as
    // separate requests would.
    Entry("q178_msearch",
      s"""WITH s1 AS (SELECT 1 AS search_idx, doc_id, lang
        |            FROM documents
        |            WHERE list_contains(${graft.text.Text.tokensSql}, 'spark')
        |            ORDER BY doc_id LIMIT 5),
        |s2 AS (SELECT 2 AS search_idx, doc_id, lang FROM documents
        |       WHERE lang = 'de' AND n_chars >= 200 ORDER BY doc_id LIMIT 5)
        |SELECT * FROM s1 UNION ALL SELECT * FROM s2
        |ORDER BY search_idx, doc_id""".stripMargin) { (s, d) =>
      val docs = T(s, d, "documents")
      val s1 = docs
        .filter(array_contains(graft.text.Text.tokens(col("text")), "spark"))
        .select(lit(1).as("search_idx"), col("doc_id"), col("lang"))
        .orderBy(col("doc_id")).limit(5)
      val s2 = docs.filter(col("lang") === "de" && col("n_chars") >= 200)
        .select(lit(2).as("search_idx"), col("doc_id"), col("lang"))
        .orderBy(col("doc_id")).limit(5)
      s1.unionAll(s2).orderBy(col("search_idx"), col("doc_id"))
    },

    // ES _delete_by_query: every document matching the query is deleted;
    // the response reports per-slice deleted counts and the post-delete
    // index state. Rendered as the audit table a deployment would emit:
    // per-lang docs_before / deleted / docs_after from ONE conditional
    // aggregation (the source scans once — never a second anti-join
    // pass). Write-path posture at scale: the matched ids become
    // tombstone rows through the SAME bucketed merge the CDC path uses
    // (q57/q158's index maintenance) — O(changed buckets) I/O, not a
    // table rewrite; this entry is the read-side contract of that batch.
    Entry("q177_delete_by_query",
      """SELECT lang, COUNT(*) AS docs_before,
        |  COUNT(CASE WHEN source = 'src2' AND n_chars < 500 THEN 1 END) AS deleted,
        |  COUNT(CASE WHEN NOT (source = 'src2' AND n_chars < 500) THEN 1 END) AS docs_after
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val hit = col("source") === "src2" && col("n_chars") < 500
      T(s, d, "documents").groupBy(col("lang"))
        .agg(count(lit(1)).as("docs_before"),
             count(when(hit, 1)).as("deleted"),
             count(when(!hit, 1)).as("docs_after"))
        .orderBy(col("lang"))
    },

    // ES _update_by_query — the sibling of q177's _delete_by_query (same
    // ES 6.3 document-level bulk API family): every document matching the
    // query gets a script applied (here: `ctx._source.n_chars += 17` on
    // short src1 docs); the response reports per-slice updated counts.
    // Rendered, like q177, as the audit table of that batch from ONE
    // conditional aggregation over a single scan: per-lang total /
    // updated count / field checksum before vs after (the checksum pins
    // the script's effect, not just the match count). Write-path posture
    // at scale is identical to q177: the updated docs flow as upsert rows
    // through the SAME bucketed merge the CDC path uses (q57/q158) —
    // O(changed buckets) I/O, tombstone-free, not a table rewrite; this
    // entry is the read-side contract of that batch.
    Entry("q193_update_by_query",
      """SELECT lang, COUNT(*) AS docs_total,
        |  COUNT(CASE WHEN source = 'src1' AND n_chars < 300 THEN 1 END) AS updated,
        |  CAST(SUM(n_chars) AS BIGINT) AS chars_before,
        |  CAST(SUM(CASE WHEN source = 'src1' AND n_chars < 300
        |               THEN n_chars + 17 ELSE n_chars END) AS BIGINT) AS chars_after
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val hit = col("source") === "src1" && col("n_chars") < 300
      T(s, d, "documents").groupBy(col("lang"))
        .agg(count(lit(1)).as("docs_total"),
             count(when(hit, 1)).as("updated"),
             sum(col("n_chars")).cast("bigint").as("chars_before"),
             sum(when(hit, col("n_chars") + 17).otherwise(col("n_chars")))
               .cast("bigint").as("chars_after"))
        .orderBy(col("lang"))
    },

    // ES parent-child family (join datatype / `has_child` + `inner_hits`,
    // ES 6.3 query DSL). Parent = customer, children = that customer's
    // orders. `has_child(filter)` returns PARENTS with >= 1 matching
    // child; `inner_hits(size=1)` attaches the best-scoring child (here:
    // highest o_totalprice, orderkey tie-break — deterministic). Shape at
    // 100 TB: ONE window pass over the filtered child table partitioned by
    // the parent key (rank + per-parent count in the same pass — no
    // self-join), then a key-co-located join to parents; both shuffles are
    // on the same key, and the child filter is pushed to the scan. This is
    // the standard "children live with their parent's routing shard" ES
    // layout expressed as co-partitioning.
    Entry("q188_has_child",
      """WITH hits AS (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn,
        |         COUNT(*) OVER (PARTITION BY o_custkey) AS n_hits
        |  FROM orders WHERE o_orderstatus = 'O' AND o_totalprice > 150000
        |)
        |SELECT c_custkey, c_name, CAST(n_hits AS BIGINT) AS n_hits,
        |       o_orderkey AS top_order, o_totalprice AS top_price
        |FROM customer JOIN hits ON o_custkey = c_custkey
        |WHERE rn = 1 ORDER BY c_custkey""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val byParent = Window.partitionBy(col("o_custkey"))
      val hits = T(s, d, "orders")
        .filter(col("o_orderstatus") === "O" && col("o_totalprice") > 150000)
        .withColumn("rn", row_number().over(
          byParent.orderBy(col("o_totalprice").desc, col("o_orderkey"))))
        .withColumn("n_hits", count(lit(1)).over(byParent))
        .filter(col("rn") === 1)
      T(s, d, "customer")
        .join(hits, col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"),
                col("n_hits").cast("bigint").as("n_hits"),
                col("o_orderkey").as("top_order"),
                col("o_totalprice").as("top_price"))
        .orderBy(col("c_custkey"))
    },

    // ES sort-parents-by-child-field (SURVEY Q288; VERDICT r18 #5): the
    // has_child request with `sort: [{"child.o_totalprice": {"mode":
    // "min"}}]` — parent hits ordered by an aggregate of their MATCHING
    // children's field (min mode; asc; c_custkey tie-break for a total
    // order). q188_has_child's shape with the sort key lifted: since
    // only the min is needed, the per-parent window collapses to ONE
    // partial-aggregated hash agg on the child key, then the parent
    // join and the output sort — no row_number pass. Parents without
    // matching children are not hits (the has_child query IS the
    // filter), matching ES.
    Entry("q288_sort_by_child",
      """WITH k AS (SELECT o_custkey, MIN(o_totalprice) AS sort_price
        |           FROM orders WHERE o_orderstatus = 'O' GROUP BY 1)
        |SELECT c_custkey, c_name, sort_price
        |FROM customer JOIN k ON o_custkey = c_custkey
        |ORDER BY sort_price, c_custkey""".stripMargin) { (s, d) =>
      val k = T(s, d, "orders").filter(col("o_orderstatus") === "O")
        .groupBy(col("o_custkey")).agg(min(col("o_totalprice")).as("sort_price"))
      T(s, d, "customer").join(k, col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("sort_price"))
        .orderBy(col("sort_price"), col("c_custkey"))
    },

    // ES `has_parent` + `inner_hits`: children whose PARENT matches a
    // filter, each child hit carrying its matching parent doc as the
    // inner hit (a child has exactly one parent, so inner_hits here is
    // the parent's fields attached to the row — ES 6.3 supports
    // inner_hits on all three join-query forms, not just has_child). The
    // parent side after its filter is small relative to the child table,
    // so it broadcasts and the child scan stays shuffle-free — at 100 TB
    // this is the only viable plan (children outnumber parents ~10:1
    // here, far more in a real corpus). The inner join replaces round
    // 10's left-semi: same matched child set, plus the projected parent
    // inner-hit columns, still broadcast-hash with no child exchange.
    Entry("q188_has_parent",
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  c_name AS parent_name, c_acctbal AS parent_acctbal
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val parents = T(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      T(s, d, "orders")
        .join(broadcast(parents), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
                col("c_name").as("parent_name"), col("c_acctbal").as("parent_acctbal"))
        .orderBy(col("o_orderkey"))
    },

    // ES `nested` query: documents carrying an ARRAY of sub-objects, where
    // the predicate must match within ONE element (not across elements —
    // the whole point of nested vs object mapping). Orders are materialized
    // as nested docs (order + array<struct> of line items) and the query is
    // an `exists()` higher-order predicate over the array, so both nested
    // conditions are tested against the SAME element. The nested build is
    // one collect_list aggregation on the child key, co-keyed with the
    // parent join — at 100 TB this is exactly the denormalized-document
    // materialization an ES indexer performs at write time, done once and
    // amortized across queries (the reference's ES does the same: nested
    // docs are built at index time, queried many times).
    // inner_hits on nested returns the matching array ELEMENTS: per doc,
    // the matched-element count and the top hit (highest l_quantity,
    // linenumber tie-break — deterministic), computed array-natively with
    // higher-order functions over the already-materialized nested doc —
    // no second child pass, no window. The oracle states the same result
    // through the flat child join + per-parent rank.
    Entry("q188_nested",
      """WITH m AS (SELECT o_orderkey, l_quantity, l_linenumber
        |           FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |           WHERE l_quantity > 49 AND l_returnflag = 'R'),
        |r AS (SELECT *, row_number() OVER (PARTITION BY o_orderkey
        |                ORDER BY l_quantity DESC, l_linenumber) AS rn FROM m)
        |SELECT o_orderkey, CAST(COUNT(*) AS BIGINT) AS n_inner,
        |  MAX(l_quantity) AS top_qty,
        |  CAST(MIN(CASE WHEN rn = 1 THEN l_linenumber END) AS INT) AS top_line
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val nestedDocs = T(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(collect_list(struct(
          col("l_quantity"), col("l_returnflag"), col("l_linenumber"))).as("items"))
      T(s, d, "orders")
        .join(nestedDocs, col("l_orderkey") === col("o_orderkey"))
        .withColumn("matched", filter(col("items"),
          it => it("l_quantity") > 49 && it("l_returnflag") === "R"))
        .filter(size(col("matched")) > 0)
        .withColumn("top_qty", array_max(transform(col("matched"), _("l_quantity"))))
        .select(col("o_orderkey"),
                size(col("matched")).cast("bigint").as("n_inner"),
                col("top_qty"),
                array_min(transform(
                  filter(col("matched"), m => m("l_quantity") === col("top_qty")),
                  _("l_linenumber"))).cast("int").as("top_line"))
        .orderBy(col("o_orderkey"))
    },

    // ES `children` AGGREGATION — the bucket-agg counterpart of q188's
    // has_child query: a terms agg on a PARENT field whose buckets then
    // aggregate over each parent's CHILDREN (per-segment child count +
    // child metric). The oracle states it as the naive parent-child join
    // + AVG; the plan pre-aggregates children to parent grain FIRST (one
    // shuffle on the routing key: per-parent count + sum partials), joins
    // co-keyed to parents, and folds segment buckets from O(parents)
    // partial rows with a map-side-combinable agg — at 100 TB the
    // segment fold never sees child-grain rows, and avg = summed
    // sums / summed counts (the q183 merge rule). `parent_id`, the last
    // family member, is a plain term filter on the routing key (q06's
    // shape) and needs no separate entry.
    Entry("q191_children_agg",
      """SELECT c_mktsegment AS seg,
        |  COUNT(DISTINCT c.c_custkey) AS n_parents,
        |  CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_children,
        |  ROUND(SUM(o.o_totalprice) / COUNT(o.o_orderkey), 4) AS avg_child_price
        |FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val ch = T(s, d, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("cn"), sum(col("o_totalprice")).as("cs"))
      T(s, d, "customer")
        .join(ch, col("o_custkey") === col("c_custkey"), "left")
        .groupBy(col("c_mktsegment").as("seg"))
        .agg(count(lit(1)).as("n_parents"),
             sum(coalesce(col("cn"), lit(0L))).cast("bigint").as("n_children"),
             round(sum(col("cs")) / sum(col("cn")), 4).as("avg_child_price"))
        .orderBy(col("seg"))
    },

    // ES `reverse_nested` AGGREGATION (SURVEY Q290; VERDICT r19 #3 — the
    // one 6.3 bucket agg neither declared nor dispositioned): inside a
    // nested bucketing (terms on a CHILD field — here the item-level
    // l_returnflag), jump back to the PARENT document level and
    // aggregate parents. The defining rule is the doc-count semantics:
    // each parent counts ONCE per bucket no matter how many of its
    // nested items matched the bucket — that is exactly the child-grain
    // DISTINCT (flag, parent) before the parent join (the q191
    // reduction, run in the opposite direction: q191 buckets parents
    // and aggregates children; this buckets children and aggregates
    // parents). Plan: one hash-agg exchange for the distinct pairs
    // (partial-agg'd — child-grain rows collapse map-side first), one
    // co-keyed join to orders on the routing key, and a final
    // map-side-combinable fold from O(parents) rows to O(buckets) —
    // at 100 TB nothing after the first exchange sees child grain.
    Entry("q290_reverse_nested",
      """WITH b AS (SELECT DISTINCT l_returnflag AS flag, l_orderkey FROM lineitem)
        |SELECT flag, CAST(COUNT(*) AS BIGINT) AS n_parents,
        |  ROUND(SUM(o_totalprice) / COUNT(*), 4) AS avg_parent_price
        |FROM b JOIN orders ON o_orderkey = l_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val parentHits = T(s, d, "lineitem")
        .select(col("l_returnflag").as("flag"), col("l_orderkey")).distinct()
      T(s, d, "orders")
        .join(parentHits, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("flag"))
        .agg(count(lit(1)).cast("bigint").as("n_parents"),
             round(sum(col("o_totalprice")) / count(lit(1)), 4).as("avg_parent_price"))
        .orderBy(col("flag"))
    }
  )
}
