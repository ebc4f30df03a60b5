package graft.api

import java.io.FileNotFoundException
import java.net.{ConnectException, SocketTimeoutException, UnknownHostException}
import java.nio.file.NoSuchFileException

/** Friendly-error taxonomy (ref `cli.py:54-179` `_friendly_error`): map
  * raw exceptions to actionable messages instead of stack traces. */
object Errors {

  def classify(e: Throwable): String = e match {
    case _: NoSuchFileException | _: FileNotFoundException =>
      "Table or metadata file not found — check the warehouse path and table name."
    case ex: NoSuchElementException if Option(ex.getMessage).exists(_.contains("Snapshot")) =>
      s"${ex.getMessage}. Use `snapshots` to list valid snapshot ids."
    case _: UnknownHostException =>
      "Catalog host could not be resolved — check the catalog URI."
    case _: ConnectException =>
      "Connection refused by the catalog endpoint — is the service running?"
    case _: SocketTimeoutException =>
      "Catalog request timed out — the endpoint is unreachable or overloaded."
    case ex: IllegalArgumentException =>
      s"Invalid argument: ${ex.getMessage}"
    case ex: SecurityException =>
      s"Access denied (check credentials/permissions): ${ex.getMessage}"
    case ex =>
      s"Unexpected error (${ex.getClass.getSimpleName}): ${ex.getMessage}"
  }

  /** Run `body`, mapping failures through the taxonomy
    * (ref `cli.py:182-189` `_run`). */
  def friendly[A](body: => A): Either[String, A] =
    try Right(body)
    catch { case e: Exception => Left(classify(e)) }
}
