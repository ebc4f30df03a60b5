package graft.tools

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, PrintStream}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.SparkSpec
import graft.api.Engine
import graft.fixtures.FixtureWriter

/** Scripted TUI sessions: keys come from a byte stream, frames go to a
  * capture buffer — the loop, layout and every tab's panel render are
  * exercised without a terminal. */
class TuiSpec extends SparkSpec {

  private def engine(): Engine = {
    val wh = Files.createTempDirectory("tuiwh").toString
    FixtureWriter.writeDemo(spark, wh)
    new Engine(spark, wh)
  }

  private def run(e: Engine, keys: String): (Tui.State, String) = {
    val in = new ByteArrayInputStream(keys.getBytes(StandardCharsets.UTF_8))
    val bos = new ByteArrayOutputStream()
    val st = Tui.loop(e, in, new PrintStream(bos, true, "UTF-8"), ansi = false)
    (st, new String(bos.toByteArray, StandardCharsets.UTF_8))
  }

  test("layout helpers: box clips/pads, sideBySide aligns ragged columns") {
    val b = Tui.box("T", Seq("hi", "a very long line that exceeds the width"), 20)
    assert(b.head.length == 20 && b.forall(_.length == 20))
    assert(b.head.startsWith("┌─ T "))
    assert(b(2).contains("…"))
    val two = Tui.sideBySide(Seq("aa", "b"), Seq("XX", "YY", "ZZ"))
    assert(two.size == 3)
    assert(two(0).startsWith("aa ") && two(2).trim == "ZZ")
  }

  test("browser navigation and tab switching render every pane") {
    val e = engine()
    // walk down to the FIRST TABLE node (root and a namespace sit above
    // it in the tree sidebar), open, then visit all 7 tabs, quit
    val ti = Tui.initial(e).nodes.indexWhere(_.isInstanceOf[Tui.TableNode])
    assert(ti == 2) // Root, first namespace, first table
    val (st, out) = run(e, "j" * ti + "\r1234567q")
    assert(st.selected == ti)
    assert(st.tab == 6) // Tree was last
    assert(out.contains("iceberg-meta — Iceberg Metadata Explorer"))
    assert(out.contains("▶ ")) // selection marker
    // the walk ALSO painted the warehouse overview (root selected) and
    // a namespace overview (ns node selected) on the way down
    assert(out.contains("warehouse rollup") && out.contains("format versions"))
    assert(out.contains("Namespace: "))
    // every tab label appears highlighted at some point
    Tui.Tabs.zipWithIndex.foreach { case (t, i) =>
      assert(out.contains(s"[${i + 1}:$t]"), s"tab $t never active")
    }
    // panel content from the engine verbs made it to the frames
    assert(out.contains("file_count"))      // Summary columns
    assert(out.contains("snapshot_id"))     // Snapshots columns
    assert(out.contains("file_path"))       // Files columns
    assert(out.contains("manifest_path"))   // Manifests columns
    assert(out.contains("file stats"))      // Health sub-boxes
    assert(out.contains("j/k:move"))        // footer bindings
  }

  test("selection wraps, arrow keys normalize, unbound keys are ignored") {
    val e = engine()
    val n = Tui.initial(e).nodes.size
    // 'k' from the top wraps to the last node; ESC [ B = down arrow
    val (st1, _) = run(e, "kq")
    assert(st1.selected == n - 1)
    val (st2, _) = run(e, "[B[B[Aq")
    assert(st2.selected == 1)
    // unbound keys change nothing and don't crash
    val (st3, _) = run(e, "zx!~q")
    assert(st3.selected == 0 && st3.tab == 0)
    // EOF (no 'q') also terminates cleanly
    val (st4, _) = run(e, "j")
    assert(st4.selected == 1)
  }

  test("reload picks up a table created after the UI started") {
    val wh = Files.createTempDirectory("tuiwh2").toString
    FixtureWriter.writeDemo(spark, wh)
    val e = new Engine(spark, wh)
    val before = e.catalog.listTables().size
    graft.meta.TableCreator.create(s"$wh/zz/late_table",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val (st, out) = run(e, "rq")
    assert(st.refs.size == before + 1)
    // tree sidebar: new namespace node + short table name
    assert(out.contains("zz") && out.contains("late_table"))
  }

  test("modal screens: ? help, d snapshot diff, s snapshot detail; next key closes") {
    val e = engine()
    // help overlay renders the binding list, and the NEXT key only
    // closes it (the 'j' after '?' must not move the selection)
    val (st1, out1) = run(e, "?jq")
    assert(st1.selected == 0 && st1.overlay.isEmpty)
    assert(out1.contains("this help") && out1.contains("any key: close"))

    // d/s from a NON-table node warn instead of crashing (reference
    // notify("Select a table first"))
    val (_, outW) = run(e, "dxq")
    assert(outW.contains("Select a table first"), outW.takeRight(1000))

    // diff on a table with 4 snapshots: the two most recent, lower id
    // first, with totals/added/deleted boxes (reference DiffScreen)
    val nodes = Tui.initial(e).nodes
    val idx = nodes.indexWhere {
      case Tui.TableNode("sales.orders") => true; case _ => false
    }
    assert(idx >= 0, nodes.toString)
    val (_, out2) = run(e, "j" * idx + "dxq")
    assert(out2.contains("Diff ") && out2.contains("->"), out2.takeRight(2000))
    assert(out2.contains("totals") && out2.contains("added") &&
      out2.contains("deleted"))
    // after the close key the normal frame (footer) painted again
    assert(out2.split("any key: close").last.contains("j/k:move"))

    // snapshot detail of the most recent snapshot: manifest columns
    val (_, out3) = run(e, "j" * idx + "sxq")
    assert(out3.contains("Snapshot ") && out3.contains("manifest_path"),
      out3.takeRight(2000))
  }

  test("pane cache: revisiting a tab repaints without a second engine call; r invalidates") {
    val e = engine()
    val cache = new Tui.PaneCache
    def drive(keys: String): Unit = {
      val in = new ByteArrayInputStream(keys.getBytes(StandardCharsets.UTF_8))
      Tui.loop(e, in, new PrintStream(new ByteArrayOutputStream(), true, "UTF-8"),
        ansi = false, cache = cache)
      ()
    }
    // walking down to the first table paints root + ns + table panes
    // (one compute each); '2' computes the table's Snapshots pane
    val ti = Tui.initial(e).nodes.indexWhere(_.isInstanceOf[Tui.TableNode])
    drive("j" * ti + "2q")
    assert(cache.computeCount == ti + 2, s"computes=${cache.computeCount}")
    // the same walk + tab visits again: every pane is CACHED — no new
    // computes (tab '1' and Enter repaint memoized panes too)
    drive("j" * ti + "21\rq")
    assert(cache.computeCount == ti + 2, s"computes=${cache.computeCount}")
    // reload clears: the repaint after 'r' re-runs the root overview
    drive("rq")
    assert(cache.computeCount == ti + 3, s"computes=${cache.computeCount}")
  }
}
