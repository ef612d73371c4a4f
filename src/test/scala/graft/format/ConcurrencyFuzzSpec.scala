package graft.format

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Randomized MODEL-BASED check of the optimistic-concurrency layer:
  * TWO OR THREE handles load the same head, each stages a random op
  * (append / update / pop / bin-pack / compact / rename), the first
  * commits and wins, and every later committer either AUTO-REBASES
  * (when the contract says its change commutes with EVERYTHING that
  * landed since its snapshot) or fails with
  * ConcurrentModificationException — the fuzzer PREDICTS which from the
  * contract alone (pairwise commute against each landed op, with
  * row-disjointness over the UNION of landed mutation hit-sets) and
  * asserts the engine agrees, then checks the full table content
  * against an id-keyed model after every round. The 3-way rounds prove
  * the COMMUTE CLOSURE the pairwise contract claims: rebasing C over
  * (A then B-rebased) must equal the pairwise conjunction — rebase
  * order introduces no new conflicts and loses no landed change. The
  * serialization the rebases promise is landing order: each loser's
  * SNAPSHOT-SCOPED change applies after everything that beat it, and
  * its mutations touch exactly the rows its handle read. Outstanding-
  * state tracking is exact: a compact that lands FIRST folds the
  * round-start lists, but a compact that lands REBASED adopts the
  * other landers' new update/tombstone entries — they stay outstanding.
  * Solo rounds interleave so renames, compacts and outstanding lists
  * build up real state for the racing rounds to trip over. MAINTENANCE
  * ops (r18) join both round shapes: vacuum and deleteBranch take
  * commit slots in racing rounds (no CAS — they always land, never join
  * the prediction; their contract is "never reclaims a live or staged
  * file", enforced by the per-round content check with vacuum under the
  * 1 h staged-file retention guard), and solo rounds run retention-0
  * vacuums to a zero-garbage fixpoint plus side-branch delete+purge
  * cycles. Complements ConcurrencySoak (threaded, throughput) with
  * deterministic interaction coverage no hand-written spec enumerates.
  */
class ConcurrencyFuzzSpec extends SparkSpec {
  import spark.implicits._

  sealed trait Kind
  case object Append extends Kind
  case object Update extends Kind
  case object Pop extends Kind
  case object BinPack extends Kind
  case object Compact extends Kind
  case object Rename extends Kind
  // maintenance kinds (r18, VERDICT r17 #5): no branch-pointer CAS, so
  // they always "land" and never join the rebase prediction — their
  // contract is "never reclaims a live or staged file", checked by the
  // content assert after every round (+ the zero-garbage dry-run on the
  // solo vacuum path)
  case object Vacuum extends Kind
  case object DeleteBranch extends Kind

  for (seed <- Seq(402, 7177, 52601))
  test(s"random racing op pairs (seed $seed): commute contract + content") {
    val rnd = new scala.util.Random(seed)
    val root = tmpDir("concfuzz") + "/t"
    var curCol = "v"
    val ds0 = GraftDataset.create(spark, root, StructType(Seq(
      StructField("id", LongType), StructField(curCol, StringType))))
    var nextId = 0L
    val model = scala.collection.mutable.Map.empty[Long, String]
    def appendRows(h: GraftDataset, n: Int): Seq[(Long, String)] = {
      val rows = (0 until n).map { _ =>
        val id = nextId; nextId += 1; (id, s"r$id")
      }
      h.append(rows.toDF("id", h.schema.fieldNames(1)))
      rows
    }
    appendRows(ds0, 40).foreach { case (i, v) => model(i) = v }
    ds0.commit("seed")

    // outstanding state of the COMMITTED table, for the predictions
    var hasUpd = false
    var hasTomb = false
    var hasRen = false

    /** Stage `kind` on a freshly-loaded handle; returns the kind
      * actually staged (no-op stagings fall back to an append), the
      * model effect to apply IF the commit lands, and the id set the
      * staged mutation touches (drives the disjointness prediction).
      * Mutations are computed against the handle's snapshot (= the
      * model now). */
    def stage(h: GraftDataset, kind: Kind, tag: String)
        : (Kind, () => Unit, Set[Long]) = kind match {
      case Append =>
        val rows = appendRows(h, 1 + rnd.nextInt(4))
        (Append, () => rows.foreach { case (i, v) => model(i) = v },
          Set.empty)
      case Update =>
        val m = 2 + rnd.nextInt(4); val r = rnd.nextInt(m)
        val hit = model.keys.filter(_ % m == r).toSet
        if (hit.isEmpty) stage(h, Append, tag)
        else {
          val n = h.update(pmod(col("id"), lit(m)) === r,
            Map(h.schema.fieldNames(1) ->
              concat(lit(s"u$tag-"), col("id").cast("string"))))
          assert(n == hit.size, s"update matched $n, model says ${hit.size}")
          (Update, () => hit.foreach(i => model(i) = s"u$tag-$i"), hit)
        }
      case Pop =>
        val m = 4 + rnd.nextInt(5); val r = rnd.nextInt(m)
        val hit = model.keys.filter(_ % m == r).toSet
        if (hit.isEmpty) stage(h, Append, tag)
        else {
          val n = h.pop(pmod(col("id"), lit(m)) === r)
          assert(n == hit.size, s"pop matched $n, model says ${hit.size}")
          (Pop, () => hit.foreach(model.remove), hit)
        }
      case BinPack =>
        if (h.optimizeSmallFiles(targetBytes = 8L << 20)._1 < 2)
          stage(h, Append, tag)
        else (BinPack, () => (), Set.empty)
      case Compact =>
        h.compact()
        (Compact, () => (), Set.empty)
      case Rename =>
        val to = s"c$tag"
        h.renameTensor(h.schema.fieldNames(1), to)
        (Rename, () => { curCol = to; () }, Set.empty)
    }

    /** The commute CONTRACT: does B's staged kind rebase over A's
      * committed kind, given the table's outstanding state and the two
      * mutations' touched-row sets? */
    def predictLands(kA: Kind, kB: Kind,
                     hitA: Set[Long], hitB: Set[Long]): Boolean = {
      val flagsClean = !hasUpd && !hasTomb && !hasRen
      kB match {
        case Append => kA match {
          case Rename => false
          case Compact => !hasRen // the fold resets the rename chain
          case _ => true
        }
        case Update | Pop => kA match {
          case Append | BinPack => true
          case Compact => flagsClean // fold moved the mutation lists
          // racing mutations commute iff they touch DISJOINT rows
          case Update | Pop => (hitA intersect hitB).isEmpty
          case _ => false // schema changes: loud
        }
        case BinPack => kA match {
          // overlapping rewrites (A binpacked/compacted the entries B
          // replaced) and schema changes stay loud
          case Append | Update | Pop => true
          case _ => false
        }
        case Compact =>
          // B's fold must be a PURE file swap (no outstanding lists to
          // fold) and A must have kept every file B replaced
          flagsClean && (kA == Append || kA == Update || kA == Pop)
        case Rename => false // schema changes never rebase
      }
    }

    def applyFlags(k: Kind): Unit = k match {
      case Update => hasUpd = true
      case Pop => hasTomb = true
      case Rename => hasRen = true
      case Compact => hasUpd = false; hasTomb = false; hasRen = false
      case _ => ()
    }

    def checkContent(where: String): Unit = {
      val t = GraftDataset.load(spark, root)
      assert(t.schema.fieldNames.toSeq == Seq("id", curCol),
        s"$where: schema ${t.schema.fieldNames.toSeq} vs (id, $curCol)")
      val got = t.toDF.orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      val want = model.toSeq.sortBy(_._1)
      assert(got == want, s"$where: table diverged from model " +
        s"(got ${got.size} rows, want ${want.size})")
      assert(t.countRows == model.size, s"$where: metadata count diverged")
    }

    /** Maintenance staging: returns the action to run in this racer's
      * commit slot. Vacuum runs with a 1 h retention — the STAGED-FILE
      * guard: other racers have written-but-uncommitted files when it
      * fires, and recent mtimes must keep them. DeleteBranch populates a
      * side branch at stage time (a real commit, but on its own branch —
      * it races nobody on main) and drops+purges it in the commit slot.
      */
    def stageMaintenance(h: GraftDataset, kind: Kind,
                         tag: String): () => Unit = kind match {
      case Vacuum => () => { h.vacuum(olderThanMs = 3600000L); () }
      case DeleteBranch =>
        val side = s"fz-$tag"
        val sider = GraftDataset.load(spark, root)
        sider.checkout(side, create = true)
        appendRows(sider, 2) // side-only rows: never enter the model
        sider.commit(s"side $tag")
        () => h.deleteBranch(side)
      case k => throw new IllegalStateException(s"not maintenance: $k")
    }

    /** Zero-garbage invariant: after a retention-0 vacuum (safe solo —
      * nothing is staged between rounds), a second dry-run retention-0
      * sweep must find NOTHING left to delete, and the content model
      * must be intact (vacuum never ate a live file).
      */
    def vacuumToZeroGarbage(h: GraftDataset, where: String): Unit = {
      h.vacuum(olderThanMs = 0L)
      val leftover = h.vacuum(olderThanMs = 0L, dryRun = true)
        .filter(col("status") === "would_delete").count()
      assert(leftover == 0L, s"$where: $leftover garbage entries survived " +
        "a retention-0 vacuum")
    }

    val kinds = Vector(Append, Append, Update, Update, Pop, BinPack,
      Compact, Rename) // appends/updates weighted: they race most often
    val maint = Vector(Vacuum, DeleteBranch)
    for (round <- 0 until 24) {
      val solo = rnd.nextInt(10) < 3
      if (solo) {
        val a = GraftDataset.load(spark, root)
        if (rnd.nextInt(3) == 0) {
          // solo maintenance: retention-0 vacuum to zero garbage, or a
          // side-branch create→populate→delete cycle that must purge the
          // branch's exclusive commits and leave main untouched
          val k = maint(rnd.nextInt(maint.size))
          if (k == Vacuum) vacuumToZeroGarbage(a, s"solo round $round")
          else {
            val commitsBefore = CommitLog.listCommits(spark, root).size
            stageMaintenance(a, DeleteBranch, s"s$round")()
            assert(!a.branches.contains(s"fz-s$round"))
            assert(CommitLog.listCommits(spark, root).size == commitsBefore,
              s"round $round: deleteBranch must purge the side branch's " +
                "exclusive commit, not strand it")
          }
          info(s"round $round: solo maintenance $k")
        } else {
          val (kA, fxA, _) = stage(a, kinds(rnd.nextInt(kinds.size)), s"s$round")
          a.commit(s"solo $kA $round")
          fxA(); applyFlags(kA)
        }
      } else {
        // 2- or 3-way race; every racer stages against the SAME head.
        // With probability ~1/4 one racer is a maintenance op: it takes
        // a commit slot (so it interleaves with real stagings and
        // landings) but never joins the rebase prediction — it has no
        // branch-pointer CAS to win or lose.
        val racers = 2 + rnd.nextInt(2)
        val handles = Vector.fill(racers)(GraftDataset.load(spark, root))
        val maintIdx =
          if (rnd.nextInt(4) == 0) Some(rnd.nextInt(racers)) else None
        val staged = handles.zipWithIndex.map { case (h, i) =>
          if (maintIdx.contains(i)) {
            val k = maint(rnd.nextInt(maint.size))
            (k, stageMaintenance(h, k, s"${('a' + i).toChar}$round"),
              Set.empty[Long])
          } else stage(h, kinds(rnd.nextInt(kinds.size)),
            s"${('a' + i).toChar}$round")
        }
        def isMaint(k: Kind) = k == Vacuum || k == DeleteBranch
        // first committer wins outright; later ones rebase iff they
        // commute PAIRWISE with every op landed since their snapshot
        // (all predictions evaluate against round-start flags — every
        // racer staged against the round-start state)
        var landed = Vector.empty[(Kind, Set[Long])]
        for (i <- 0 until racers) {
          // for data ops the function is the MODEL effect (applied after
          // a landing commit); for maintenance it IS the action
          val (k, fxOrAction, hit) = staged(i)
          if (isMaint(k)) fxOrAction() // always "lands"; not in prediction
          else if (landed.isEmpty) {
            handles(i).commit(s"W $k $round")
            fxOrAction(); landed :+= ((k, hit))
          } else {
            val lands = landed.forall { case (kW, hitW) =>
              predictLands(kW, k, hitW, hit) }
            if (lands) {
              handles(i).commit(s"L$i $k $round (rebased)")
              fxOrAction(); landed :+= ((k, hit))
            } else {
              intercept[java.util.ConcurrentModificationException](
                handles(i).commit(s"L$i $k $round (must conflict)"))
              // the loser's change is dropped entirely
            }
          }
        }
        // outstanding-state bookkeeping, exact w.r.t. rebase adoption:
        // at most one Compact lands per racing round (Compact never
        // rebases over Compact); landing FIRST it folds the round-start
        // lists, landing REBASED it folds those AND adopts the earlier
        // landers' new entries — but those entries are re-staged by the
        // rebase as its own adopted head, so in both positions the
        // round-start lists are gone while every OTHER landed op's new
        // entries remain outstanding
        if (landed.exists(_._1 == Compact)) {
          hasUpd = false; hasTomb = false; hasRen = false
        }
        landed.foreach { case (k, _) => if (k != Compact) applyFlags(k) }
        info(s"round $round: ${staged.map(_._1).mkString(" vs ")} -> " +
          s"${landed.size}/$racers landed " +
          s"(${landed.map(_._1).mkString(",")})")
      }
      checkContent(s"after round $round")
    }
  }
}
