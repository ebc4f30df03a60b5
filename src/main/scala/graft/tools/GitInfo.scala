package graft.tools

import java.nio.file.{Files, Path}

/** Git facts for measurement stamping — the support behind
  * [[graft.Bench]]'s `distributed_commit` / `distributed_stale` sidecar
  * fields: which commit is HEAD, whether `src/main` differs NOW (in the
  * worktree, committed or not) from a stamped commit, and whether the
  * worktree is clean under `src/main`.
  *
  * `roots` are candidate repo directories, consulted in order until one
  * answers — callers put the directory that OWNS the artifact first
  * (e.g. the sidecar's parent) so a run launched from inside some
  * unrelated checkout never stamps that repo's HEAD. Every pathspec
  * carries the `:(top)` magic, so answers are identical from any
  * subdirectory of the consulted root.
  *
  * The git BINARY is authoritative (it resolves worktree/submodule
  * `.git` FILES, packed refs, and pathspec magic alike); a manual
  * loose/packed-ref parse backs up `head` for hosts without git
  * installed. Every query degrades to None/false — the CONSERVATIVE
  * direction for staleness decisions (no answer reads as stale, never
  * as fresh).
  */
final class GitInfo(roots: Seq[Path]) {

  /** Pathspec guarding the staleness questions: the library source,
    * anchored at the repo toplevel regardless of which subdirectory the
    * consulted root is. */
  val SrcPathspec = ":(top)src/main"

  private[tools] def out(root: Path, cmd: String*): Option[String] =
    scala.util.Try {
      val p = new ProcessBuilder(
        (Seq("git", "-C", root.toAbsolutePath.toString) ++ cmd): _*).start()
      val o = new String(p.getInputStream.readAllBytes(), "UTF-8").trim
      require(p.waitFor() == 0); o
    }.toOption

  /** Loose/packed-ref parse of `.git/HEAD` — the no-git-installed
    * fallback. Only resolves when `root` IS the repo toplevel and
    * `.git` is a real directory (a worktree/submodule `.git` file needs
    * the binary). */
  private[tools] def parsedHeadAt(root: Path): Option[String] =
    scala.util.Try {
      val git = root.resolve(".git")
      val head = new String(Files.readAllBytes(git.resolve("HEAD")), "UTF-8").trim
      if (!head.startsWith("ref: ")) head
      else {
        val ref = head.drop(5).trim
        val refPath = ref.split('/').foldLeft(git)(_.resolve(_))
        if (Files.exists(refPath))
          new String(Files.readAllBytes(refPath), "UTF-8").trim
        else { // packed refs
          val src = scala.io.Source.fromFile(git.resolve("packed-refs").toFile)
          try src.getLines()
            .collectFirst { case l if l.endsWith(" " + ref) => l.split(' ').head }
            .get
          finally src.close()
        }
      }
    }.toOption

  private def headAt(root: Path): Option[String] =
    out(root, "rev-parse", "HEAD").orElse(parsedHeadAt(root))

  /** HEAD of the first root that resolves. */
  def head: Option[String] = roots.flatMap(headAt).headOption

  /** Whether `src/main` is IDENTICAL in the current worktree to its
    * state at `commit` — a ONE-commit diff against the worktree, not
    * HEAD, because uncommitted edits are exactly as stale-making as
    * committed ones. `git diff` is blind to UNTRACKED files, and a
    * brand-new source file changes behavior exactly like an edit, so
    * the untracked census joins the verdict. None = could not tell (no
    * git binary, unknown commit) — callers treat that as "changed". */
  def srcUnchangedSince(commit: String): Option[Boolean] =
    roots.flatMap { r =>
      for {
        diff <- out(r, "diff", "--name-only", commit, "--", SrcPathspec)
        untracked <- out(r, "ls-files", "--others", "--exclude-standard",
          "--", SrcPathspec)
      } yield diff.isEmpty && untracked.isEmpty
    }.headOption

  /** Whether the worktree is clean under `src/main`, as a TRI-state:
    * Some(true)/Some(false) when git answered, None when it could not
    * (no binary, not a repo) — callers that RECORD a verdict must not
    * turn "unknown" into an affirmative "dirty" claim. */
  def srcCleanStatus: Option[Boolean] =
    roots.flatMap(r =>
      out(r, "status", "--porcelain", "--", SrcPathspec))
      .headOption.map(_.isEmpty)

  /** Whether the worktree is clean under `src/main` — a measurement
    * from a dirty tree must not stamp HEAD (the stamp would not contain
    * the measured code, poisoning every later staleness verdict).
    * False when no root answers: no stamp reads as stale, the
    * conservative direction. */
  def srcClean: Boolean = srcCleanStatus.contains(true)
}
