package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      // static conf, read at context level: lets the GraftExtensions
      // spec build a second session over this context and observe the
      // extension-injected functions in its fresh registry
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

/** Smoke + invariants for the relational surface. The authoritative
  * correctness gate is the DuckDB oracle (scripts/check.py / driver); these
  * specs assert cheap structural invariants that catch regressions fast.
  */
class RelationalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("every query runs and yields rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("every query has either an oracle or is explicitly rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.subsetOf(SparkEntry.rowsOnlyQueries),
      s"queries without oracle nor rows-only declaration: ${missing -- SparkEntry.rowsOnlyQueries}")
  }

  test("oracle keys all refer to implemented queries") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without query: $orphans")
  }

  test("no implemented-but-unreachable operator (registry reachability)") {
    // Every method shaped like a query — returns a DataFrame, first
    // params (SparkSession, dir: String) — on ANY operator module must be
    // wired into SparkEntry (directly or via a registered wrapper), or be
    // on the explicit helper allowlist. Guards against the q134 failure
    // mode: real code shipped for rounds with no queries entry, oracle,
    // or spec. (private[graft] helpers compile to public bytecode, so
    // genuine shared helpers need the allowlist, not a visibility check.)
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/SparkEntry.scala")))
    val modules: Seq[(String, AnyRef, Set[String])] = Seq(
      ("GraphOps", operators.GraphOps,
        // shared sweep; exercised via the q124/q125/q132/q134 wrappers
        Set("multiSourceCosts")),
      ("Relational", operators.Relational,
        // full sketch funnels: the registered q54/q85 are their
        // oracle-stable projections (sketch columns aren't cross-engine
        // comparable); bounds asserted in PropertySpec
        Set("approxDistinctFunnel", "approxPercentileFunnel")),
      ("Windows", operators.Windows, Set.empty),
      ("Joins", operators.Joins, Set.empty),
      ("Skew", operators.Skew, Set.empty),
      ("TextAnalysis", operators.TextAnalysis, Set.empty),
      ("CorpusOps", operators.CorpusOps, Set.empty),
      // imagePhashes: the shared fingerprint relation BEHIND the
      // registered q187/q188 wrappers (both call it directly)
      ("Multimodal", operators.Multimodal, Set("imagePhashes")),
      ("Dedup", operators.Dedup, Set.empty),
      ("Similarity", operators.Similarity, Set.empty),
      ("Behavioral", operators.Behavioral, Set.empty),
      ("Bpe", operators.Bpe, Set.empty),
      ("Classifier", operators.Classifier, Set.empty),
      ("StreamingClassifier", streaming.StreamingClassifier,
        // store-scoring steps of the registered q220/q222 wrappers
        // (String param is the store dir); trajectory replays in
        // StreamingSpec
        Set("classifierTable", "classifierHeldoutTable")),
      ("StreamingIndex", streaming.StreamingIndex,
        // store-assembly steps of the registered q226/q227/q233/q234/
        // q246 wrappers (String param is the store dir); store ==
        // one-shot-encode / one-shot-postings, drift-replay, and
        // compaction invariants (dense + lexical) asserted in
        // StreamingSpec
        Set("indexTable", "indexDriftTable", "lexIndexTable",
          "compactTable", "compactLexTable")),
      // hotAggregate: the cached table BEHIND the registered q66 wrapper,
      // exposed so PlanSpec can pin InMemoryRelation + exercise unpersist
      ("Sources", operators.Sources, Set("hotAggregate")),
      ("EventStreams", streaming.EventStreams,
        // store-assembly steps of the registered q154/q186 wrappers
        // (String param is the store dir, the mvTable precedent);
        // equivalence asserted in StreamingSpec, flatness in ScaleSmoke
        Set("funnelTable", "transitionsTable")),
      ("StreamingMv", streaming.StreamingMv,
        // store-assembly step of the registered q162 wrapper (String
        // param is the store dir); MV invariant asserted in StreamingSpec
        // sampleMonitorTable: store-assembly step of the registered
        // q189 wrapper (String param is the store dir)
        // contamTable: store-assembly step of the registered q197
        // wrapper (String param is the store dir); monitor == batch-gate
        // invariant asserted in StreamingSpec
        // driftTable/noveltyTable: store-assembly steps of the
        // registered q216/q221 wrappers (String param is the store
        // dir); invariants asserted in StreamingSpec
        Set("mvTable", "sampleMonitorTable", "contamTable",
          "driftTable", "noveltyTable")),
      ("StreamingDedup", streaming.StreamingDedup,
        // store-assembly steps of the registered q133/q135 wrappers (the
        // String param is the store dir, not a fixture dir); equivalence
        // asserted in StreamingSpec. readBefore/readAll/mergedCounts are
        // private store-IO helpers (batch-keyed partition reads + the
        // incremental counts merge) that only look query-shaped in
        // bytecode.
        // spanTable: store-assembly step of the registered q202 wrapper
        // (String param is the store dir); monitor == batch equivalence
        // asserted in StreamingSpec
        Set("keepList", "semanticDecisionTable", "spanTable",
          "readBefore", "readBeforeBuckets", "readAll", "mergedCounts")))
    val unwired = modules.flatMap { case (name, obj, allow) =>
      obj.getClass.getDeclaredMethods.toSeq
        .filter(m => classOf[org.apache.spark.sql.Dataset[_]]
          .isAssignableFrom(m.getReturnType))
        .filter { m =>
          val p = m.getParameterTypes
          p.length >= 2 &&
            p(0) == classOf[org.apache.spark.sql.SparkSession] &&
            p(1) == classOf[String]
        }
        .map(_.getName).filterNot(_.contains("$")).distinct
        .filterNot(allow)
        .filterNot(n => src.contains(s"$name.$n"))
        .map(n => s"$name.$n")
    }
    assert(unwired.isEmpty,
      s"operators not reachable from SparkEntry: $unwired")
  }

  test("group-by counts sum to table count") {
    val t = Tables(spark, sf)
    val total = t.lineitem.count()
    val byKey = operators.Relational.groupByHash(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("cnt")).head().getLong(0)
    assert(byKey == total)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
