package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's self-adjudication contract (round 9): the headline is the
  * sum of per-gate STEADY times and contention marking is evidence-based.
  * Round 8's judged artifact recorded a 3.6× "regression" that was pure
  * machine contention; these helpers are what makes a future artifact
  * carry its own alibi, so their edge cases are pinned here.
  */
class BenchSpec extends AnyFunSuite {
  private def run(sec: Double, ok: Boolean = true, other: Double = 0.0) =
    Bench.GateRun(sec, ok, "fp", other, ownCpu = sec, load1 = 1.0)

  test("steady is the min of the passes; degrades to cold without a warm pass") {
    assert(Bench.steady(run(5.0), Some(run(1.5))) === 1.5)
    // a load burst on the WARM pass must not inflate steady either
    assert(Bench.steady(run(1.2), Some(run(30.0))) === 1.2)
    assert(Bench.steady(run(3.0), None) === 3.0)
    // a crashed warm pass is ignored, not min'd at its short abort time
    assert(Bench.steady(run(3.0), Some(run(0.1, ok = false))) === 3.0)
  }

  test("steadyAll folds the re-run pass in; crashed or missing passes are ignored") {
    assert(Bench.steadyAll(run(5.0), Seq(run(1.5), run(0.9))) === 0.9)
    // the re-run can only improve the steady, never inflate it
    assert(Bench.steadyAll(run(1.2), Seq(run(30.0), run(40.0))) === 1.2)
    assert(Bench.steadyAll(run(3.0), Nil) === 3.0)
    assert(Bench.steadyAll(run(3.0), Seq(run(0.1, ok = false))) === 3.0)
  }

  test("cleanRerun: only a measurably quiet, efficient re-run clears the flag") {
    val t = 4.0
    val ref = Some(Bench.RefGate(steady = 1.0, plan = "fp", cpuWall = 28.0))
    // quiet window, wall at reference: rescued
    assert(Bench.cleanRerun(run(1.05), t, ref, eff = 27.0))
    // no committed reference row (new plan): the /proc evidence decides
    assert(Bench.cleanRerun(run(1.05), t, None, eff = 27.0))
    // foreign load during the re-run too: still contended
    assert(!Bench.cleanRerun(run(1.05, other = 10.0), t, ref, eff = 27.0))
    // UNKNOWN load sample must not rescue — absence of evidence clears
    // nothing (the mirror of contended's -1 rule)
    assert(!Bench.cleanRerun(run(1.05, other = -1.0), t, ref, eff = 27.0))
    // quiet by /proc but the wall ballooned while the JVM sat idle: the
    // bursty-load signature effDrop exists for — not rescued
    assert(!Bench.cleanRerun(run(19.5), t, ref, eff = 28.0 / 19.5))
    // a crashed re-run rescues nothing
    assert(!Bench.cleanRerun(run(0.1, ok = false), t, ref, eff = -1.0))
  }

  test("contended trips on either pass, never on unknown (-1) samples") {
    val t = 4.0
    assert(Bench.contended(run(1.0, other = 10.0), None, t))
    assert(Bench.contended(run(1.0, other = 0.0), Some(run(1.0, other = 10.0)), t))
    assert(!Bench.contended(run(1.0, other = 3.9), Some(run(1.0, other = 0.0)), t))
    // -1 = "could not measure": absence of evidence marks nothing
    assert(!Bench.contended(run(1.0, other = -1.0), Some(run(1.0, other = -1.0)), t))
    assert(!Bench.contended(run(1.0, other = -1.0), None, t))
  }

  // ---- round-10 reference self-check ---------------------------------
  // Round 9's driver artifact was 1.86× inflated with ZERO contended
  // markers (the foreign load averaged 0-3 cores in the /proc window yet
  // doubled wall times); these pins replay that exact situation against
  // the two new triggers.

  test("effDrop replays round 9: join_semi_topk 19.5 s recorded vs 1.0 s reference") {
    // clean run: ~28 cores busy on a 32-core box → cpu/wall ~ 28. The
    // inflated run did the SAME CPU work over 19.5× the wall → eff ~1.4,
    // far under 0.6× the reference ratio — trips even at other_cores 0.02.
    val ref = Bench.RefGate(steady = 1.0, plan = "fp", cpuWall = 28.0)
    assert(Bench.effDrop(steady = 19.5, eff = 28.0 / 19.5, ref = ref))
    // the same gate on a quiet re-run: wall at reference, full efficiency
    assert(!Bench.effDrop(steady = 1.05, eff = 27.0, ref = ref))
    // slow but HOT (own CPU scaled with wall — real extra work, e.g. a
    // data change): not contention, must stay visible as drift instead
    assert(!Bench.effDrop(steady = 19.5, eff = 27.0, ref = ref))
    // wall inflated but under the 1.5x ratio: jitter, not a verdict
    assert(!Bench.effDrop(steady = 1.4, eff = 10.0, ref = ref))
    // sub-floor gates never trip (scheduler jitter on sub-second windows)
    assert(!Bench.effDrop(steady = 0.2, eff = 1.0,
      ref = Bench.RefGate(0.05, "fp", 28.0)))
    // unknown CPU samples (-1) on either side never trip
    assert(!Bench.effDrop(steady = 19.5, eff = -1.0, ref = ref))
    assert(!Bench.effDrop(steady = 19.5, eff = 1.0,
      ref = Bench.RefGate(1.0, "fp", -1.0)))
  }

  test("vsReference marks a 1.86x run inflated and a 1.0x run clean") {
    val inflated = Seq.fill(118)((1.86, 1.0))
    assert(Bench.vsReference(inflated).exists(_ > Bench.InflatedVsRef))
    val clean = Seq.fill(118)((1.02, 1.0))
    val r = Bench.vsReference(clean)
    assert(r.exists(v => v > 0.9 && v <= Bench.InflatedVsRef))
    // too few fingerprint-matched gates (mass re-plan → regen prompt, not
    // an inflation verdict) or an empty reference: no ratio at all
    assert(Bench.vsReference(Seq.fill(19)((1.86, 1.0))).isEmpty)
    assert(Bench.vsReference(Nil).isEmpty)
  }

  test("the committed reference covers exactly the registry, at the judged scale") {
    // a gate added without SPARK_GRAFT_REGEN_BENCH_REFERENCE=1 (or a
    // removal that leaves a stale row) must fail HERE, not silently
    // shrink the self-check's n_ref_matched at the next judged run
    val lines = java.nio.file.Files
      .readAllLines(java.nio.file.Paths.get(Bench.ReferencePath))
      .toArray.toSeq.map(_.toString)
    val (sf, _, gates) = Bench.parseReference(lines)
    assert(sf === "sf0.1", "reference must be recorded at the driver's judged scale")
    val registry = SparkEntry.queries.keySet
    assert(gates.keySet === registry,
      s"reference out of sync (missing: ${(registry -- gates.keySet).toSeq.sorted}, " +
        s"stale: ${(gates.keySet -- registry).toSeq.sorted}) — regenerate with " +
        "SPARK_GRAFT_REGEN_BENCH_REFERENCE=1 on a quiet machine")
    gates.foreach { case (n, r) =>
      assert(r.steady > 0 && r.plan.length === 32 && r.cpuWall > 0,
        s"$n: implausible reference row $r")
    }
  }

  test("the latest committed round record is complete: full registry, zero failures") {
    // Round 10 shipped a 24-gate hole: the driver's CORRECTNESS artifact
    // silently OMITTED erred gates (96 rows for a 120-gate registry) and
    // nothing owned the "every registry gate has a green row" invariant.
    // The builder-committed round record is the artifact we control, so
    // the invariant lives here: a record with crashed gates, a non-empty
    // failed list, or registry coverage gaps cannot sit committed while
    // the suite is green.
    // Resolved from the forked test JVM's working directory — build.sbt
    // forks tests at the repo root; the guard makes a future CWD drift a
    // readable failure instead of a silent empty listing.
    val repoRoot = new java.io.File(sys.props("user.dir"))
    assert(new java.io.File(repoRoot, "build.sbt").exists(),
      s"test JVM CWD ${repoRoot.getAbsolutePath} is not the repo root — " +
        "cannot locate committed round records")
    val records = Option(repoRoot.listFiles()).get
      .filter(_.getName.matches("bench_r\\d+_gates\\.json"))
    assert(records.nonEmpty, "no committed bench_r{N}_gates.json round record")
    val latest = records.maxBy(f => "\\d+".r.findFirstIn(f.getName).get.toInt)
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(latest)
    assert(!root.has("failed") || root.get("failed").size() == 0,
      s"${latest.getName} records failed gates: ${root.get("failed")} — " +
        "fix them and regenerate the round record")
    // Round-12 provenance requirement: the committed record is the number
    // a future reader takes as THE round's performance, so a run that
    // still carries unresolved contention or reads inflated against the
    // committed quiet reference cannot become the record — re-run it on a
    // quiet machine (the bench's own post-sweep re-run clears transient
    // bursts; a record that stays flagged was measured on a busy box).
    // Records before round 12 predate the re-run machinery and are exempt.
    val roundNo = "\\d+".r.findFirstIn(latest.getName).get.toInt
    if (roundNo >= 12) {
      assert(!root.has("contended"),
        s"${latest.getName} is a contended run (n_contended=" +
          s"${root.get("n_contended")}) — regenerate it on a quiet machine")
      assert(!root.has("inflated_vs_reference"),
        s"${latest.getName} reads inflated against the committed reference " +
          s"(vs_reference=${root.get("vs_reference")}) — regenerate it on a quiet machine")
    }
    assert(root.has("queries"),
      s"${latest.getName} has no queries object — malformed round record")
    val qs = root.get("queries")
    val recorded = {
      val it = qs.fieldNames(); val b = Set.newBuilder[String]
      while (it.hasNext) b += it.next(); b.result()
    }
    val registry = SparkEntry.queries.keySet
    assert((registry -- recorded).isEmpty,
      s"${latest.getName} is missing registry gates " +
        s"${(registry -- recorded).toSeq.sorted} — regenerate the round record " +
        "(full bench run, then copy bench_details.json over it)")
    registry.foreach { n =>
      assert(!qs.get(n).get("steady").isNull,
        s"${latest.getName}: $n crashed in the recorded run (steady null)")
    }
  }

  test("the latest round record's plan hashes agree with the committed reference") {
    // Round 17 closed with a record and a reference regenerated from
    // DIFFERENT build states: the gate-name completeness check above
    // passed while 14 plan hashes disagreed, and only PlanFingerprintSpec
    // (at sf0.001) caught the drift. The desync must be a red test the
    // moment it is committed: for every gate present in BOTH artifacts the
    // plan hash must MATCH, and the record's own n_ref_matched must equal
    // its gate count (r17's scripted record carried 165 for 166 gates —
    // an impossibility under close_round.sh's own step-4 assert, i.e. the
    // record did not come from the close it claimed). Records before
    // round 18 predate this contract and are exempt; r17's is the
    // documented stale instance.
    //
    // CONTRACT (round 19, ADVICE): bench_reference.txt is regenerated
    // ONLY by tools/close_round.sh. Between a mid-round re-plan/registry
    // change and the next close, this test (and the reference-coverage
    // test above) is EXPECTEDLY red — a tree whose committed record and
    // committed reference describe different code must not look green.
    // The close's own final `sbt test` is the green gate; do not regen
    // the reference by hand to silence the interim red.
    val repoRoot = new java.io.File(sys.props("user.dir"))
    val records = Option(repoRoot.listFiles()).get
      .filter(_.getName.matches("bench_r\\d+_gates\\.json"))
    assert(records.nonEmpty, "no committed bench_r{N}_gates.json round record")
    val latest = records.maxBy(f => "\\d+".r.findFirstIn(f.getName).get.toInt)
    val roundNo = "\\d+".r.findFirstIn(latest.getName).get.toInt
    if (roundNo >= 18) {
      val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(latest)
      val qs = root.get("queries")
      val (_, _, refGates) = Bench.parseReference(java.nio.file.Files
        .readAllLines(java.nio.file.Paths.get(Bench.ReferencePath))
        .toArray.toSeq.map(_.toString))
      val names = {
        val it = qs.fieldNames(); val b = Seq.newBuilder[String]
        while (it.hasNext) b += it.next(); b.result()
      }
      val mismatched = names.filter { n =>
        refGates.get(n).exists(_.plan != qs.get(n).get("plan").asText())
      }
      assert(mismatched.isEmpty,
        s"${latest.getName} and bench_reference.txt carry different plan hashes " +
          s"for ${mismatched.sorted} — record and reference describe DIFFERENT " +
          "code; re-run tools/close_round.sh on the committed tree")
      assert(root.get("n_ref_matched").asInt() === names.size,
        s"${latest.getName}: n_ref_matched ${root.get("n_ref_matched")} != " +
          s"${names.size} gates — a reference row was recorded from other code")
    }
  }

  // ---- round-19 record mint (storm-resilient round close) -------------
  // The round-18 close ran nine confirm sweeps into recurring hypervisor
  // steal storms and could not mint a record; the mint now assembles the
  // record per gate from every sweep whose window for THAT gate was
  // quiet, min-merged like the committed reference. These pins are the
  // mint's evidence rules.

  test("mint qualification: contended, eff_drop, plan-mismatch, no-reference are not evidence") {
    val ref = Some(Bench.RefGate(1.0, "fp", 28.0))
    def g(contended: Boolean = false, effDrop: Boolean = false,
        plan: String = "fp", other: Double = 0.1, adj: Double = -1.0) =
      RecordMint.SweepGate(1.1, 1.5, plan, other, 30.0, 27.0, 1.0,
        contended, effDrop, adj)
    assert(RecordMint.qualifies(g(), ref, None))
    assert(!RecordMint.qualifies(g(contended = true), ref, None))
    assert(!RecordMint.qualifies(g(effDrop = true), ref, None))
    // a stale-build measurement (plan differs from the committed
    // reference) prices code this tree does not ship — never evidence
    assert(!RecordMint.qualifies(g(plan = "other"), ref, None))
    // no reference row at all: the record could not price it — refuse
    assert(!RecordMint.qualifies(g(), None, None))
    // the probe-adjusted fallback: a window flagged ONLY by the
    // eff_drop heuristic, with no foreign-core evidence and a
    // probe-adjusted ratio at/under the inflation bar, is a quiet
    // measurement of a slower machine — admissible (the
    // join_range_views_before_purchase deadlock of the first close)
    assert(RecordMint.qualifies(
      g(contended = true, effDrop = true, adj = 0.96), ref, None))
    assert(RecordMint.qualifies(
      g(contended = true, effDrop = true, adj = Bench.InflatedVsRef), ref, None))
    // ...but a probe-adjusted ratio past the bar is a REAL slowdown
    assert(!RecordMint.qualifies(
      g(contended = true, effDrop = true, adj = 1.31), ref, None))
    // ...foreign-core evidence in the window blocks the fallback
    assert(!RecordMint.qualifies(
      g(contended = true, effDrop = true, other = 5.0, adj = 0.96), ref, None))
    // ...and unknown samples (-1) admit nothing
    assert(!RecordMint.qualifies(
      g(contended = true, effDrop = true, other = -1.0, adj = 0.96), ref, None))
    assert(!RecordMint.qualifies(
      g(contended = true, effDrop = true, adj = -1.0), ref, None))
    // round 20 (ADVICE r19): when the sweep carries its machine ratio,
    // the admissibility ratio is RECOMPUTED against the reference in
    // force now — steady 1.1 on a 1.0x machine vs ref 1.0 is 1.1
    // (admissible) even when the RECORDED stale ratio said 1.31, and a
    // stale-flattering 0.96 cannot launder a real 1.1/0.5/1.0 = 2.2
    assert(RecordMint.qualifies(
      g(contended = true, effDrop = true, adj = 1.31), ref, Some(1.0)))
    assert(!RecordMint.qualifies(
      g(contended = true, effDrop = true, adj = 0.96), ref, Some(0.5)))
  }

  test("mint adjVsRef: sweep machine ratio recomputes against the CURRENT reference") {
    val g = RecordMint.SweepGate(1.2, 1.5, "fp", 0.1, 30.0, 27.0, 1.0,
      contended = false, effDrop = false, vsRefProbeAdj = 0.8)
    // sweep measured a 1.5x machine: adjusted steady 0.8 s vs ref 1.0 s
    assert(math.abs(RecordMint.adjVsRef(g, Some(1.5), 1.0) - 0.8) < 1e-9)
    // no machine ratio: the recorded (possibly stale) ratio is the only
    // evidence the sweep carries — fall back to it, never guess
    assert(RecordMint.adjVsRef(g, None, 1.0) === 0.8)
    // non-positive machine ratio / reference steady: fall back too
    assert(RecordMint.adjVsRef(g, Some(0.0), 1.0) === 0.8)
    assert(RecordMint.adjVsRef(g, Some(1.5), 0.0) === 0.8)
  }

  test("mint merge: per-gate min across quiet windows only; a never-quiet gate refuses") {
    val ref = Map("a" -> Bench.RefGate(1.0, "fa", 28.0),
      "b" -> Bench.RefGate(2.0, "fb", 28.0))
    def g(s: Double, plan: String, contended: Boolean = false) =
      RecordMint.SweepGate(s, s, plan, 0.1, 30.0, 27.0, 1.0, contended, false)
    val s0 = RecordMint.Sweep("sf",
      None, Map("a" -> g(5.0, "fa", contended = true), "b" -> g(2.2, "fb")))
    val s1 = RecordMint.Sweep("sf",
      None, Map("a" -> g(1.2, "fa"), "b" -> g(2.8, "fb")))
    val merged = RecordMint.merge(Seq(s0, s1), ref, Set("a", "b"))
      .toOption.get
    // a's storm-hit sweep-0 measurement is NOT min'd in; b's sweep-0 IS
    // (its window was quiet even though a's was not — per-gate evidence)
    assert(merged("a").g.steady === 1.2 && merged("a").sweep === 1)
    assert(merged("b").g.steady === 2.2 && merged("b").sweep === 0)
    // a gate with no quiet window anywhere refuses the mint, named
    val left = RecordMint.merge(Seq(s0), ref, Set("a", "b"))
    assert(left.isLeft && left.left.toOption.get.contains("a"))
  }

  test("mint render: record satisfies the committed-record contract; inflated refuses") {
    val n = 25 // above vsReference's 20-matched floor
    val ref = (0 until n).map(i => s"g$i" -> Bench.RefGate(1.0, s"f$i", 28.0)).toMap
    def merged(steady: Double) = (0 until n).map(i => s"g$i" ->
      RecordMint.Minted(RecordMint.SweepGate(
        steady, steady, s"f$i", 0.1, 30.0, 27.0, 1.0,
        contended = false, effDrop = false), 0)).toMap
    val (doc, rawOut) = RecordMint.render(merged(1.05), ref,
      "/root/testdata/sf0.1", 3, _ => None).toOption.get
    assert(math.abs(rawOut - 1.05) < 0.011,
      "render must surface the raw ratio (main gates last-quiet refresh on it)")
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(doc)
    // exactly the flags the committed-record contract rejects must be absent
    assert(!root.has("failed") && !root.has("contended")
      && !root.has("inflated_vs_reference"))
    assert(root.get("n_ref_matched").asInt === n)
    assert(root.get("queries").size === n)
    assert(root.get("minted").asBoolean && root.get("n_sweeps").asInt === 3)
    assert(math.abs(root.get("vs_reference").asDouble - 1.05) < 0.011)
    (0 until n).foreach { i =>
      val q = root.get("queries").get(s"g$i")
      assert(!q.get("steady").isNull && q.get("plan").asText === s"f$i")
    }
    // a successful raw-clean mint doubles as the persisted quiet record
    assert(Bench.lastQuietSummary(doc).isDefined)
    // quiet windows that still measure slow: such a record must NOT mint
    assert(RecordMint.render(merged(1.5), ref, "sf", 1, _ => None).isLeft)
    // raw-inflated on a probe-measured slow machine: mints, carrying BOTH
    // numbers (the r18 judge's raw-1.99x/adjusted-1.05x adjudication),
    // and render surfaces the raw ratio so main can SKIP the last-quiet
    // refresh (round 20, ADVICE r19: adjusted-only mints must not weaken
    // the round-16 raw-un-inflated persistence contract)
    def mergedAdj(steady: Double, adj: Double) = (0 until n).map(i => s"g$i" ->
      RecordMint.Minted(RecordMint.SweepGate(
        steady, steady, s"f$i", 0.1, 30.0, 27.0, 1.0,
        contended = false, effDrop = false, vsRefProbeAdj = adj), 0)).toMap
    val (slowDoc, slowRaw) = RecordMint.render(mergedAdj(1.5, 1.02), ref,
      "sf", 2, _ => None).toOption.get
    assert(slowRaw > Bench.InflatedVsRef,
      "the adjusted-only path must be detectable from the returned raw ratio")
    val slowRoot = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(slowDoc)
    assert(math.abs(slowRoot.get("vs_reference").asDouble - 1.5) < 0.011)
    assert(math.abs(slowRoot.get("vs_reference_probe_adj").asDouble - 1.02) < 0.011)
    assert(!slowRoot.has("inflated_vs_reference"))
    // a real regression inflates the ADJUSTED ratio too — refused
    assert(RecordMint.render(mergedAdj(1.5, 1.45), ref, "sf", 2, _ => None).isLeft)
    // round 20 (ADVICE r19): with per-sweep machine ratios available the
    // adjusted total comes from steady/machineRatio against the FINAL
    // reference — a 1.5x-raw sweep on a measured 1.5x machine adjusts to
    // 1.0x and mints, regardless of what stale ratio the sweep recorded
    val (ratioDoc, _) = RecordMint.render(mergedAdj(1.5, -1.0), ref,
      "sf", 2, _ => Some(1.5)).toOption.get
    val ratioRoot = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(ratioDoc)
    assert(math.abs(ratioRoot.get("vs_reference_probe_adj").asDouble - 1.0) < 0.011)
    // ...and a genuinely regressed 1.5x raw on a 1.0x machine refuses
    assert(RecordMint.render(mergedAdj(1.5, -1.0), ref, "sf", 2,
      _ => Some(1.0)).isLeft)
  }

  test("mint parseSweep: lifts flags and skips crashed gates; refuses malformed docs") {
    val doc = """{"metric":"total","value":3.0,"queries":{
      |"ok":{"cold":2.0,"steady":1.5,"plan":"ab","other_cores":0.1,
      |  "own_cpu":30.0,"cpu_wall":27.0,"load1":1.0},
      |"storm":{"cold":9.0,"steady":8.0,"plan":"cd","other_cores":11.0,
      |  "own_cpu":30.0,"cpu_wall":3.0,"load1":9.0,"eff_drop":true,"contended":true},
      |"crashed":{"cold":null,"steady":null,"plan":"err","other_cores":-1,
      |  "own_cpu":-1,"cpu_wall":-1,"load1":1.0}
      |},"sf":"/root/testdata/sf0.1"}""".stripMargin
    val RecordMint.Sweep(sf, adjRatio, gates) =
      RecordMint.parseSweep(doc).toOption.get
    assert(sf === "/root/testdata/sf0.1")
    assert(adjRatio.isEmpty, "no probe object → no machine ratio")
    assert(gates.keySet === Set("ok", "storm")) // crashed never parses in
    assert(gates("ok").steady === 1.5 && !gates("ok").contended)
    assert(gates("storm").contended && gates("storm").effDrop)
    assert(RecordMint.parseSweep("not json").isLeft)
    assert(RecordMint.parseSweep("""{"value":1.0}""").isLeft)
    // the sweep's whole-machine ratio (probe.adj_ratio) is lifted for
    // the mint's current-reference recompute (round 20, ADVICE r19)
    val withProbe = doc.replace(""""sf":""",
      """"probe":{"single_start":0.3,"adj_ratio":1.42},"sf":""")
    assert(RecordMint.parseSweep(withProbe).toOption.get.adjRatio
      === Some(1.42))
  }

  test("quietRecordEligible: only a clean, uncontended, un-inflated FULL sweep persists") {
    // round 16: the persisted bench_last_quiet.json must never be written
    // by a run whose own numbers are suspect — each leg of the contract
    // individually blocks eligibility
    def ok(full: Boolean = true, failed: Boolean = false, cont: Int = 0,
        vs: Option[Double] = Some(1.1)) =
      Bench.quietRecordEligible(full, failed, cont, vs)
    assert(ok())
    assert(ok(vs = Some(Bench.InflatedVsRef))) // exactly at the bar is quiet
    assert(!ok(full = false), "a BENCH_ONLY-filtered run must not persist")
    assert(!ok(failed = true), "a run with crashed gates must not persist")
    assert(!ok(cont = 1), "a contended run must not persist")
    assert(!ok(vs = Some(1.31)), "an inflated run must not persist")
    assert(!ok(vs = None), "no reference ratio → unverifiable → not quiet")
  }

  test("lastQuietSummary embeds headline fields and refuses flagged/malformed docs") {
    val quiet = """{"metric":"total","value":121.3,"vs_reference":1.23,""" +
      """"vs_reference_probe_adj":0.98,"queries":{"a":{},"b":{}}}"""
    val got = Bench.lastQuietSummary(quiet)
    assert(got === Some(
      """{"value":121.3,"vs_reference":1.23,"vs_reference_probe_adj":0.98,"n_queries":2}"""))
    // the embed itself must be valid JSON — it nests into the artifact
    val tree = new com.fasterxml.jackson.databind.ObjectMapper().readTree(got.get)
    assert(tree.get("value").asDouble === 121.3 && tree.get("n_queries").asInt === 2)
    // a doc carrying its own contended/inflated flags is poisoned evidence
    assert(Bench.lastQuietSummary(
      """{"value":581.8,"vs_reference":5.89,"inflated_vs_reference":true}""").isEmpty)
    assert(Bench.lastQuietSummary(
      """{"value":200.6,"vs_reference":2.32,"contended":true}""").isEmpty)
    // malformed / headline-less docs are refused, not thrown
    assert(Bench.lastQuietSummary("not json").isEmpty)
    assert(Bench.lastQuietSummary("""{"value":1.0}""").isEmpty)
    assert(Bench.lastQuietSummary("").isEmpty)
    // a queries-less doc is malformed (only FULL sweeps persist) — refuse
    // it rather than leak an n_queries sentinel into the artifact (r17)
    assert(Bench.lastQuietSummary(
      """{"value":121.3,"vs_reference":1.23}""").isEmpty)
  }

  test("parseReference round-trips and rejects malformed rows") {
    val (sf, probe, gates) = Bench.parseReference(Seq(
      "# comment", "sf=sf0.1",
      "hash_agg_sum 1.287 c6a4fab6 27.500",
      "join_semi_topk 0.949 ec3a23ec 24.000"))
    assert(sf === "sf0.1")
    assert(probe.isEmpty, "no probe line → no probe reference")
    assert(gates("hash_agg_sum") === Bench.RefGate(1.287, "c6a4fab6", 27.5))
    assert(gates.size === 2)
    intercept[IllegalArgumentException](
      Bench.parseReference(Seq("sf=sf0.1", "badrow 1.0")))
    intercept[IllegalArgumentException](Bench.parseReference(Seq("no_sf_line")))
  }

  test("parseReference reads the optional machine-probe line") {
    val (_, probe, gates) = Bench.parseReference(Seq(
      "sf=sf0.1", "probe=0.312,0.841,32",
      "hash_agg_sum 1.287 c6a4fab6 27.500"))
    assert(probe === Some(Bench.RefProbe(0.312, 0.841, 32)))
    assert(gates.size === 1)
    // a legacy 2-field line parses with threads = -1 (multi comparison
    // is then skipped — the count it was measured at is unknown)
    val (_, legacy, _) = Bench.parseReference(Seq(
      "sf=sf0.1", "probe=0.312,0.841"))
    assert(legacy === Some(Bench.RefProbe(0.312, 0.841, -1)))
    // a malformed probe line fails loudly, same contract as gate rows
    intercept[IllegalArgumentException](
      Bench.parseReference(Seq("sf=sf0.1", "probe=oops")))
  }

  test("probeAdj: mean over ends of the worst comparable ratio; None when unknowable") {
    val ref = Some(Bench.RefProbe(single = 0.3, multi = 0.8, threads = 32))
    // single-only degradation (multi at reference): per-end ratio is the
    // single's, whole-sweep estimate is the mean of the two ends —
    // (0.45/0.3 + 0.75/0.3) / 2 = 2.0 — NOT the max (that is
    // machine_slow's question, "degraded at any point")
    def adj(s: (Double, Double), e: (Double, Double), t: Int): Double =
      Bench.probeAdj(Some(s), Some(e), ref, t).get
    assert(math.abs(adj((0.45, 0.8), (0.75, 0.8), 32) - 2.0) < 1e-9)
    // the measured co-tenant mode (round-14 spinner demo): a single probe
    // thread stochastically finds a free core (1.2x) while the all-core
    // pass degrades the full 2x the 32-wide gates actually feel — the
    // per-end ratio must take the WORSE of the two
    assert(math.abs(adj((0.36, 1.6), (0.36, 1.6), 32) - 2.0) < 1e-9)
    // multi at a DIFFERENT thread count than the reference: not the same
    // measurement, single decides alone
    assert(math.abs(adj((0.36, 1.6), (0.36, 1.6), 16) - 1.2) < 1e-9)
    // quiet machine at the reference speed: ratio 1.0, vs_ref unchanged
    assert(math.abs(adj((0.3, 0.8), (0.3, 0.8), 32) - 1.0) < 1e-9)
    // missing either probe or the reference → no adjustment, never a
    // guessed 1.0 (an unknowable machine state must not launder vs_ref)
    assert(Bench.probeAdj(None, Some((0.3, 0.8)), ref, 32).isEmpty)
    assert(Bench.probeAdj(Some((0.3, 0.8)), None, ref, 32).isEmpty)
    assert(Bench.probeAdj(Some((0.3, 0.8)), Some((0.3, 0.8)), None, 32).isEmpty)
    // a corrupt (non-positive) reference single cannot divide
    assert(Bench.probeAdj(Some((0.3, 0.8)), Some((0.3, 0.8)),
      Some(Bench.RefProbe(0.0, 0.8, 32)), 32).isEmpty)
  }

  test("machine_slow bar is looser than the run-inflation bar (min-merged reference)") {
    // the probe reference min-merges across regens, converging to the
    // all-time-fastest pass: a quiet run reads 1.0-1.3x from frequency
    // jitter alone, so the slow verdict must sit above that band while
    // staying under the 1.57-1.8x degradations it exists to catch
    assert(Bench.ProbeSlowRatio > Bench.InflatedVsRef)
    assert(Bench.ProbeSlowRatio === 1.5)
  }

  test("awaitQuietWindow: waits out a steal storm, bounded, unknowable = quiet") {
    // simulated busy→quiet transition (round 15): the counter climbs 2 s
    // of steal per 2 s window for three windows, then flatlines — the
    // wait must return quiet on the FIRST flat window, not before
    var t = 0.0
    val samples = Iterator(0.0, 2.0, 4.0, 6.0, 6.1) ++ Iterator.continually(6.1)
    val it = samples
    val (quiet, waited) = Bench.awaitQuietWindow(
      steal = () => { t = it.next(); t }, sleep = _ => (),
      windowMs = 2000L, maxWaitMs = 120000L, quietSteal = 0.25)
    assert(quiet && waited === 8000L,
      s"expected quiet after the 4th window (8 s), got quiet=$quiet waited=$waited")
    // a storm that NEVER lifts: give up at the budget, loudly not-quiet
    var c = 0.0
    val (q2, w2) = Bench.awaitQuietWindow(
      steal = () => { c += 2.0; c }, sleep = _ => (),
      windowMs = 2000L, maxWaitMs = 10000L, quietSteal = 0.25)
    assert(!q2 && w2 === 10000L)
    // an unreadable counter (-1, off-Linux): no evidence to wait out —
    // quiet immediately, never a two-minute block on an unknowable
    val (q3, w3) = Bench.awaitQuietWindow(() => -1.0, _ => ())
    assert(q3 && w3 === 0L)
    // quiet machine from the start: one confirmation window, then go
    val (q4, w4) = Bench.awaitQuietWindow(() => 5.0, _ => (),
      windowMs = 2000L, maxWaitMs = 120000L, quietSteal = 0.25)
    assert(q4 && w4 === 2000L)
  }

  test("cpuProbe: deterministic workload returns plausible positive timings") {
    // 2 threads keeps the unit test cheap; the probe must be strictly
    // positive and the multi pass (same per-core work on every core,
    // run concurrently) cannot beat a single core's pass
    val (single, multi) = Bench.cpuProbe(2)
    assert(single > 0 && multi > 0)
    assert(multi >= single * 0.5, s"multi $multi implausibly fast vs single $single")
  }
}
