package graft.tools

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

/** The measurement-stamping git facts behind Bench's
  * `distributed_commit`/`distributed_stale` sidecar fields — exercised
  * against a real scratch repository, including the subdirectory,
  * dirty-tree, foreign-sha, and non-repo degradation paths that each
  * produced a review finding when this logic lived inline in Bench. */
class GitInfoSpec extends AnyFunSuite {

  private def sh(cwd: Path, cmd: String*): Unit = {
    val p = new ProcessBuilder(cmd: _*)
      .directory(cwd.toFile).redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    assert(p.waitFor() == 0, s"${cmd.mkString(" ")} failed:\n$out")
  }

  private def scratchRepo(): (Path, Path) = {
    val dir = Files.createTempDirectory("gitinfo")
    sh(dir, "git", "init", "-q")
    sh(dir, "git", "config", "user.email", "spec@example.invalid")
    sh(dir, "git", "config", "user.name", "spec")
    val src = dir.resolve("src/main/scala")
    Files.createDirectories(src)
    Files.write(src.resolve("A.scala"), "object A\n".getBytes("UTF-8"))
    sh(dir, "git", "add", "-A")
    sh(dir, "git", "commit", "-q", "-m", "seed")
    (dir, src)
  }

  test("head resolves, and the manual .git parse agrees with the binary") {
    val (dir, _) = scratchRepo()
    val gi = new GitInfo(Seq(dir))
    val h = gi.head
    assert(h.exists(_.matches("[0-9a-f]{40}")))
    assert(gi.parsedHeadAt(dir) == h, "loose-ref parse must agree with rev-parse")
  }

  test("srcUnchangedSince diffs the WORKTREE: uncommitted src edits read as changed") {
    val (dir, src) = scratchRepo()
    val gi = new GitInfo(Seq(dir))
    val seed = gi.head.get
    assert(gi.srcUnchangedSince(seed).contains(true))
    assert(gi.srcClean)
    // an UNCOMMITTED edit under src/main — HEAD still == seed, but the
    // measured-at-seed timings are stale from this instant
    Files.write(src.resolve("A.scala"), "object A2\n".getBytes("UTF-8"))
    assert(gi.srcUnchangedSince(seed).contains(false),
      "dirty src/main must read as changed even though HEAD is unmoved")
    assert(!gi.srcClean)
    // committing it: still changed vs seed, unchanged vs the new HEAD
    sh(dir, "git", "add", "-A"); sh(dir, "git", "commit", "-q", "-m", "edit")
    assert(gi.srcUnchangedSince(seed).contains(false))
    assert(gi.srcUnchangedSince(gi.head.get).contains(true))
    assert(gi.srcClean)
  }

  test("an UNTRACKED file under src/main stales the stamp (diff alone is blind to it)") {
    val (dir, src) = scratchRepo()
    val gi = new GitInfo(Seq(dir))
    val seed = gi.head.get
    // a brand-new source file changes behavior exactly like an edit,
    // but `git diff <commit>` never lists untracked paths
    Files.write(src.resolve("B.scala"), "object B\n".getBytes("UTF-8"))
    assert(gi.srcUnchangedSince(seed).contains(false),
      "an untracked src/main file must read as changed")
    assert(!gi.srcClean)
    // an untracked file OUTSIDE src/main changes nothing
    Files.write(dir.resolve("NOTES.md"), "notes\n".getBytes("UTF-8"))
    Files.delete(src.resolve("B.scala"))
    assert(gi.srcUnchangedSince(seed).contains(true))
    assert(gi.srcClean)
  }

  test("a sidecar-only commit does not stale the stamp (the self-falsifying loop)") {
    val (dir, _) = scratchRepo()
    val gi = new GitInfo(Seq(dir))
    val measured = gi.head.get
    // committing the refreshed sidecar moves HEAD without touching
    // src/main — the carried timings must still read FRESH
    Files.write(dir.resolve("BENCH_DETAIL.json"), "{}".getBytes("UTF-8"))
    sh(dir, "git", "add", "-A"); sh(dir, "git", "commit", "-q", "-m", "sidecar")
    assert(gi.head.get != measured)
    assert(gi.srcUnchangedSince(measured).contains(true),
      "a non-src commit must not tag the carried section stale")
    assert(gi.srcClean)
  }

  test("answers are identical from a repo SUBDIRECTORY (the :(top) anchor)") {
    val (dir, src) = scratchRepo()
    val atRoot = new GitInfo(Seq(dir))
    val atSub = new GitInfo(Seq(src)) // src/main/scala, two levels down
    val seed = atRoot.head.get
    assert(atSub.head.contains(seed))
    Files.write(src.resolve("A.scala"), "object A2\n".getBytes("UTF-8"))
    assert(atSub.srcUnchangedSince(seed).contains(false),
      "a cwd-relative pathspec would silently match nothing from a subdir")
    assert(!atSub.srcClean)
  }

  test("degradation is CONSERVATIVE: foreign sha, non-repo root, root ordering") {
    val (dir, _) = scratchRepo()
    val gi = new GitInfo(Seq(dir))
    // unknown commit → None (callers read None as stale), never Some(true)
    assert(gi.srcUnchangedSince("0" * 40).isEmpty)
    // a non-repo root alone answers nothing: the boolean view stays
    // conservative (not clean), while the TRI-state distinguishes
    // "unknown" from an affirmative "dirty" — recording callers (the
    // bench's distributed_dirty vs distributed_git_unknown markers)
    // depend on that difference
    val nowhere = new GitInfo(Seq(Files.createTempDirectory("notarepo")))
    assert(nowhere.head.isEmpty)
    assert(nowhere.srcUnchangedSince("0" * 40).isEmpty)
    assert(!nowhere.srcClean)
    assert(nowhere.srcCleanStatus.isEmpty)
    assert(gi.srcCleanStatus.contains(true))
    // ...but a later root still answers: the first root that RESOLVES
    // wins, not the first root listed
    val ordered = new GitInfo(Seq(
      Files.createTempDirectory("notarepo"), dir))
    assert(ordered.head == gi.head)
    assert(ordered.srcUnchangedSince(gi.head.get).contains(true))
  }
}
