package graft.sources

import java.nio.file.{Files, Paths}

/** Deterministic synthetic workload generator — the capability analog
  * of the reference's ~3.8k-query RF training corpus
  * (`models/Queries/Local_TPCDS/tpcds_Local_train.ndjson`: the corpus
  * ships as DATA; no generator code exists in the reference, so the
  * shapes below are re-parameterized over this library's fixture
  * schema, not ported).
  *
  * Reference corpus shapes reproduced (train.ndjson lines 1-4, plus a
  * full-corpus profile: joins 0-5 near-uniform, 34% scalar aggregates,
  * ~30% OR disjunctions):
  *   - `SELECT [g1[, g2],] COUNT(*) AS agg_0 FROM fact
  *      [LEFT OUTER JOIN dim ON fk = pk]{0..5}`
  *      — join chains walk a fixed fk→pk graph
  *   - predicates drawn from: large integer IN-lists, string IN-lists,
  *     `CAST(col AS varchar) [NOT] LIKE '%..%..%'`, `IS [NOT] NULL`,
  *     `col = 'literal'`, `col != 'literal'`, numeric `>=`/`<=`/`!=`
  *     comparisons, and parenthesized 2-3-arm OR disjunctions of the
  *     above (the comparison and 3-arm-OR shapes match the reference's
  *     IMDB corpus profile)
  *   - two-thirds grouped: `GROUP BY` + `ORDER BY` over the selected
  *     group columns (total order → deterministic output for any
  *     runner); one-third scalar: a single global COUNT(*) row, no
  *     GROUP BY/ORDER BY — like the reference's ungrouped third;
  *     ~one-third of either carry an `avg(int)` / `avg(a + b)`
  *     second aggregate (IMDB profile).
  *
  * Generation is a pure function of (n, seed): java.util.Random's LCG
  * is pinned by its javadoc, so the same inputs yield byte-identical
  * SQL on any JVM — asserted by SyntheticWorkloadSpec.
  */
object SyntheticWorkload {

  // ---------------------------------------------------------- schema
  /** fk → pk edges over the fixture tables (LEFT OUTER JOIN chains). */
  private case class Edge(fromTable: String, fk: String,
      toTable: String, pk: String)

  private val edges: Seq[Edge] = Seq(
    Edge("lineitem", "l_orderkey", "orders", "o_orderkey"),
    Edge("lineitem", "l_partkey", "part", "p_partkey"),
    Edge("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    Edge("orders", "o_custkey", "customer", "c_custkey"),
    Edge("customer", "c_nationkey", "nation", "n_nationkey"),
    Edge("supplier", "s_nationkey", "nation", "n_nationkey"),
    Edge("nation", "n_regionkey", "region", "r_regionkey"))

  /** Chain start tables (facts first — they dominate like the
    * reference's store_sales/web_sales/... starts). */
  private val startTables =
    Seq("lineitem", "lineitem", "lineitem", "orders", "orders",
      "customer", "part", "events", "events")

  /** Low-cardinality columns usable as GROUP BY keys. */
  private val groupCols: Map[String, Seq[String]] = Map(
    "lineitem" -> Seq("l_returnflag", "l_linestatus", "l_linenumber"),
    "orders"   -> Seq("o_orderstatus", "o_orderpriority"),
    "customer" -> Seq("c_mktsegment", "c_nationkey"),
    "supplier" -> Seq("s_nationkey"),
    "part"     -> Seq("p_brand", "p_type", "p_size"),
    "nation"   -> Seq("n_name", "n_regionkey"),
    "region"   -> Seq("r_name"),
    "events"   -> Seq("event_type"))

  /** Integer columns for IN-lists, with the key range to draw from. */
  private val intInCols: Map[String, Seq[(String, Int)]] = Map(
    "lineitem" -> Seq(("l_partkey", 2000), ("l_suppkey", 100),
      ("l_linenumber", 7)),
    "orders"   -> Seq(("o_custkey", 1500)),
    "customer" -> Seq(("c_nationkey", 25)),
    "supplier" -> Seq(("s_nationkey", 25)),
    "part"     -> Seq(("p_size", 50), ("p_partkey", 2000)),
    "nation"   -> Seq(("n_nationkey", 25), ("n_regionkey", 5)),
    "region"   -> Seq(("r_regionkey", 5)),
    "events"   -> Seq(("user_id", 1000)))

  /** String columns with their (fixture) value pools for IN / `=`. */
  private val strCols: Map[String, Seq[(String, Seq[String])]] = Map(
    "lineitem" -> Seq(
      ("l_returnflag", Seq("A", "N", "R")),
      ("l_linestatus", Seq("F", "O"))),
    "orders" -> Seq(
      ("o_orderstatus", Seq("F", "O", "P")),
      ("o_orderpriority", Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
        "4-NOT SPECIFIED", "5-LOW"))),
    "customer" -> Seq(
      ("c_mktsegment", Seq("AUTOMOBILE", "BUILDING", "FURNITURE",
        "HOUSEHOLD", "MACHINERY"))),
    "supplier" -> Seq.empty,
    "part" -> Seq(
      ("p_brand", (1 to 25).map(i => s"Brand#$i")),
      ("p_type", Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL",
        "STANDARD"))),
    "nation" -> Seq(("n_name", (0 until 25).map(i => s"NATION_$i"))),
    "region" -> Seq(("r_name", Seq("AFRICA", "AMERICA", "ASIA", "EUROPE",
      "MIDDLE EAST"))),
    "events" -> Seq(
      ("event_type", Seq("click", "error", "purchase", "signup", "view"))))

  /** Columns for `CAST(col AS varchar) [NOT] LIKE` (any type works —
    * the reference casts numerics and dates alike). */
  private val castLikeCols: Map[String, Seq[String]] = Map(
    "lineitem" -> Seq("l_quantity", "l_extendedprice", "l_partkey"),
    "orders"   -> Seq("o_totalprice", "o_custkey"),
    "customer" -> Seq("c_acctbal", "c_name"),
    "supplier" -> Seq("s_acctbal", "s_name"),
    "part"     -> Seq("p_retailprice", "p_name"),
    "nation"   -> Seq("n_name"),
    "region"   -> Seq("r_name"),
    "events"   -> Seq("value", "props"))

  /** Nullable-ish columns for IS [NOT] NULL (fixture data is mostly
    * non-null; the predicate still exercises the planner like the
    * reference's). */
  private val nullCols: Map[String, Seq[String]] = castLikeCols

  // ------------------------------------------------------- generator

  /** One generated query: reference-log field shape. */
  final case class SynthQuery(queryId: String, sql: String)

  /** Generate `n` queries as a pure function of (n, seed). */
  def generate(n: Int, seed: Long): Seq[SynthQuery] = {
    val rng = new java.util.Random(seed)
    val width = math.max(4, n.toString.length)
    (1 to n).map { i =>
      val id = s"q${("%0" + width + "d").format(i)}"
      SynthQuery(id, genQuery(rng))
    }
  }

  private def pick[A](rng: java.util.Random, xs: Seq[A]): A =
    xs(rng.nextInt(xs.size))

  /** `table.column` — plain identifiers: Spark parses double-quoted
    * names as string literals unless ansi.doubleQuotedIdentifiers is
    * flipped, and these queries must run against a vanilla session. */
  private def q(table: String, col: String): String = s"$table.$col"

  private def sqlStr(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Random LIKE pattern of 2-3 fragments between % wildcards, like
    * the reference's '%1%2.0%' / '%Sport%s%'. */
  private def likePattern(rng: java.util.Random): String = {
    val frags = Seq("1", "2", "3", "5", "7", "9", "0", "2.0", "1.5", "00",
      "a", "e", "s", "r", "AN", "Br", "ce", "ing", "15", "25")
    val k = 2 + rng.nextInt(2)
    (1 to k).map(_ => pick(rng, frags)).mkString("%", "%", "%")
  }

  private def genPredicate(rng: java.util.Random,
      tables: Seq[String], allowOr: Boolean = true): String = {
    val t = pick(rng, tables)
    rng.nextInt(if (allowOr) 8 else 7) match {
      case 7 => // parenthesized 2-3-arm OR disjunction — carries ~30%
                // of the reference corpus; arms are base predicates
                // (no nesting), like "(p1 OR p2 OR p3)" in the IMDB
                // train corpus
        val arms = 2 + rng.nextInt(2)
        (1 to arms).map(_ => genPredicate(rng, tables, allowOr = false))
          .mkString("(", " OR ", ")")
      case 6 => // numeric comparison on an integer column (the IMDB
                // corpus profile: `"id" >= 2`, `"id" <= 5`, `"id" != 5`)
        val (c, range) = pick(rng, intInCols(t))
        val op = pick(rng, Seq(">=", "<=", "!="))
        s"${q(t, c)} $op ${rng.nextInt(range)}"
      case 0 => // integer IN-list, 5-20 values (reference: 12-17 seen)
        val pools = intInCols(t)
        if (pools.isEmpty) genPredicate(rng, tables, allowOr)
        else {
          val (c, range) = pick(rng, pools)
          val k = 5 + rng.nextInt(16)
          val vals = Seq.fill(k)(rng.nextInt(range)).distinct
          s"${q(t, c)} IN (${vals.mkString(", ")})"
        }
      case 1 => // string IN-list
        val pools = strCols(t)
        if (pools.isEmpty) genPredicate(rng, tables, allowOr)
        else {
          val (c, pool) = pick(rng, pools)
          val k = math.min(pool.size, 2 + rng.nextInt(8))
          val vals = Seq.fill(k)(pick(rng, pool)).distinct
          s"${q(t, c)} IN (${vals.map(sqlStr).mkString(", ")})"
        }
      case 2 => // CAST .. [NOT] LIKE — the reference's Trino corpus says
                // `AS varchar`; Spark's canonical text type is `string`
                // (its varchar is a legacy alias that warns per parse)
        val c = pick(rng, castLikeCols(t))
        val not = if (rng.nextBoolean()) "NOT " else ""
        s"CAST(${q(t, c)} AS string) ${not}LIKE ${sqlStr(likePattern(rng))}"
      case 3 => // IS [NOT] NULL
        val c = pick(rng, nullCols(t))
        val not = if (rng.nextBoolean()) "NOT " else ""
        s"${q(t, c)} IS ${not}NULL"
      case 4 => // inequality on a pooled string value (`!=` carries
                // ~40% of the reference corpus' predicates — sampled
                // across tpcds_Local_train.ndjson, not just its head)
        val pools = strCols(t)
        if (pools.isEmpty) genPredicate(rng, tables, allowOr)
        else {
          val (c, pool) = pick(rng, pools)
          s"${q(t, c)} != ${sqlStr(pick(rng, pool))}"
        }
      case _ => // equality on a pooled string value
        val pools = strCols(t)
        if (pools.isEmpty) genPredicate(rng, tables, allowOr)
        else {
          val (c, pool) = pick(rng, pools)
          s"${q(t, c)} = ${sqlStr(pick(rng, pool))}"
        }
    }
  }

  private def genQuery(rng: java.util.Random): String = {
    // 1. join chain: random walk over fk edges from a start table
    val start = pick(rng, startTables)
    val nJoins = rng.nextInt(6) // 0-5, near-uniform like the reference
    var joined = Vector(start)
    val joinClauses = Vector.newBuilder[String]
    var guard = 0
    while (joined.size <= nJoins && guard < 8) {
      guard += 1
      val candidates = edges.filter(e =>
        joined.contains(e.fromTable) && !joined.contains(e.toTable))
      if (candidates.isEmpty) guard = 8
      else {
        val e = pick(rng, candidates)
        joined :+= e.toTable
        joinClauses += s"LEFT OUTER JOIN ${e.toTable} ON " +
          s"${q(e.fromTable, e.fk)} = ${q(e.toTable, e.pk)}"
      }
    }
    // 2. shape: one-third scalar (single global COUNT(*) row — the
    //    reference corpus is 34% ungrouped), two-thirds grouped with
    //    1-2 group columns drawn from any joined table
    val scalar = rng.nextInt(3) == 0
    val gcols =
      if (scalar) Seq.empty
      else {
        val groupPool = joined.flatMap(t => groupCols(t).map(c => q(t, c)))
        val nGroup = 1 + rng.nextInt(2)
        Seq.fill(nGroup)(pick(rng, groupPool)).distinct
      }
    // 2b. ~one-third of queries also carry an avg over an integer
    //     column or a two-column arithmetic sum — the reference's IMDB
    //     corpus profile (`avg("t"."id")`, `avg("a"."x" + "b"."y")`).
    //     Integer-only arguments keep the value deterministic across
    //     engines: exact integral sum, one double division.
    val intPool = joined.flatMap(t => intInCols(t).map { case (c, _) => q(t, c) })
    val avgAgg =
      if (rng.nextInt(3) != 0 || intPool.isEmpty) None
      else {
        val a = pick(rng, intPool)
        val expr =
          if (rng.nextBoolean()) s"$a + ${pick(rng, intPool)}" else a
        Some(s"avg($expr) as agg_1")
      }
    // 3. predicates: 1-3, AND-joined
    val nPred = 1 + rng.nextInt(3)
    val preds = (1 to nPred).map(_ => genPredicate(rng, joined)).distinct
    // 4. assemble (reference line shape; grouped queries carry a total
    //    ORDER BY over the group columns, scalar ones have neither —
    //    exactly the reference's GROUP BY == ORDER BY pairing)
    val fromSql = (start +: joinClauses.result()).mkString(" ")
    val select =
      (gcols ++ Seq("COUNT(*) as agg_0") ++ avgAgg.toSeq).mkString(", ")
    val tail =
      if (scalar) ""
      else s" GROUP BY ${gcols.mkString(", ")}" +
        s" ORDER BY ${gcols.mkString(", ")}"
    s"SELECT $select FROM $fromSql WHERE ${preds.mkString(" AND ")}$tail"
  }

  // --------------------------------------------------------- running

  /** Write the generated corpus as name-sorted q*.sql files — the
    * exact input shape [[WorkloadRunner.runWorkload]] consumes. */
  def writeQueryFiles(dir: String, queries: Seq[SynthQuery]): Unit = {
    Files.createDirectories(Paths.get(dir))
    queries.foreach { sq =>
      Files.writeString(Paths.get(dir, s"${sq.queryId}.sql"), sq.sql + "\n")
    }
  }

  // ------------------------------------------- oracle-gated promotions

  /** Qualified double-typed columns: `CAST(double AS string)` rendering
    * is engine-specific (Java shortest-roundtrip flips to scientific
    * notation at 1e7; DuckDB never does), so a LIKE over that text can
    * match different rows per engine. Generated queries touching these
    * under CAST are excluded from the hash-gated promotions (they still
    * run in the measured corpus, where Spark is the only executor). */
  private val engineRenderedCast: Seq[String] = Seq(
    "lineitem.l_quantity", "lineitem.l_extendedprice",
    "orders.o_totalprice", "customer.c_acctbal", "supplier.s_acctbal",
    "part.p_retailprice", "events.value")

  private def castSafe(sq: SynthQuery): Boolean =
    !engineRenderedCast.exists(c => sq.sql.contains(s"CAST($c"))

  /** A promoted query must return rows at EVERY fixture SF — an empty
    * result makes the hash gate trivially vacuous. Reject the conjunct
    * shapes that can empty a smoke-scale table: `IS NULL` (fixtures
    * are non-null), plain `LIKE` (arbitrarily selective pattern; the
    * permissive `NOT LIKE` stays), and integer IN-lists over domains
    * larger than the smallest fixture tables. The spec asserts the
    * survivors actually produce groups. */
  private def smokeSafe(sq: SynthQuery): Boolean = {
    val sql = sq.sql
    val notLikes = "NOT LIKE".r.findAllIn(sql).size
    val likes = "LIKE".r.findAllIn(sql).size
    !sql.contains(" IS NULL") &&
      likes == notLikes &&
      """(?:partkey|suppkey|custkey|user_id|p_size) IN \(""".r
        .findFirstIn(sql).isEmpty &&
      // range scans on big-domain keys (`partkey >= 1990`) can empty a
      // smoke-scale table the same way big-domain IN-lists can; `!=`
      // and small-domain comparisons stay
      """(?:partkey|suppkey|custkey|user_id|p_size) (?:>=|<=)""".r
        .findFirstIn(sql).isEmpty
  }

  /** Pinned corpus members promoted into the DuckDB hash gate — one
    * per headline query/predicate shape. Selection is a deterministic
    * scan of generate(600, 42L), so the promoted texts are a pure
    * function of the generator version; any generator change re-gates
    * them automatically. */
  lazy val promoted: Seq[(String, SynthQuery)] = {
    val corpus = generate(600, 42L)
    def first(label: String)(p: SynthQuery => Boolean): (String, SynthQuery) =
      label -> corpus.find(sq => castSafe(sq) && smokeSafe(sq) && p(sq))
        .getOrElse(sys.error(s"no $label-shaped query in the pinned corpus"))
    Seq(
      first("synth_join_chain") { sq =>
        "LEFT OUTER JOIN".r.findAllIn(sq.sql).size >= 3
      },
      first("synth_large_inlist") { sq =>
        // large IN-list restricted to the small-domain key columns
        // (nationkey/regionkey/linenumber, <=25 values, present at
        // every SF): a 10+-value IN over a 2000-key domain can match
        // zero rows of a smoke-scale table, and an empty result makes
        // the hash gate trivially vacuous
        """(?:nationkey|regionkey|linenumber) IN \(([^)]*)\)""".r
          .findAllMatchIn(sq.sql).exists(_.group(1).count(_ == ',') >= 9)
      },
      first("synth_cast_notlike")(_.sql.contains("NOT LIKE")),
      first("synth_string_neq")(_.sql.contains(" != ")),
      first("synth_isnotnull")(_.sql.contains("IS NOT NULL")),
      first("synth_or_disjunction")(_.sql.contains(" OR ")),
      first("synth_scalar_count")(!_.sql.contains("GROUP BY")),
      first("synth_avg_arith") { sq =>
        sq.sql.contains("avg(") && sq.sql.contains(" + ")
      },
      first("synth_numeric_cmp") { sq =>
        """ (?:>=|<=) \d""".r.findFirstIn(sq.sql).isDefined
      })
  }

  type Q = (org.apache.spark.sql.SparkSession, String) =>
    org.apache.spark.sql.DataFrame

  /** Promoted synthetic queries for the driver's oracle gate. */
  val queries: Map[String, Q] =
    promoted.map { case (name, sq) =>
      name -> ((s: org.apache.spark.sql.SparkSession, dir: String) => {
        graft.Tables.registerAll(s, dir)
        s.sql(sq.sql)
      }): (String, Q)
    }.toMap

  /** DuckDB twins: same text modulo the text-type name (Spark `string`
    * = DuckDB `varchar`) — mechanical rewrite, cannot drift. */
  val oracles: Map[String, String] =
    promoted.map { case (name, sq) =>
      name -> sq.sql.replace(" AS string)", " AS varchar)")
    }.toMap

  /** Generate, persist, and measure a synthetic corpus end-to-end:
    * tables registered from `sfDir`, every query timed through
    * [[WorkloadRunner]], NDJSON log + SQL texts land in `outDir`.
    * Returns the per-query results. */
  def generateAndRun(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      outDir: String, n: Int, seed: Long, attempt: Int = 1,
      drain: WorkloadRunner.Drain = WorkloadRunner.CollectDrain)
      : Seq[WorkloadRunner.QueryResult] = {
    graft.Tables.registerAll(spark, sfDir)
    val queries = generate(n, seed)
    val qdir = s"$outDir/queries"
    writeQueryFiles(qdir, queries)
    WorkloadRunner.runWorkload(spark, qdir, outDir, attempt, drain = drain)
  }
}
