package graft.multimodal

import scala.util.control.NonFatal

/** Dead-letter plumbing for the codec lane — the multimodal form of the
  * engine's per-record error isolation (reference OP-3 log-and-continue,
  * `/root/reference/lib/lambda/dynamo-stream-handler.ts:18-27`, mirrored for
  * CDC records by [[graft.cdc.RecordProcessor.processSafe]]).
  *
  * At 100 TB a scraped corpus WILL contain truncated/garbage blobs; a decode
  * `require` aborts the task and, after Spark's 4 retries, the whole job on
  * one bad row. Instead every decode operator returns its meta columns as
  * nullable plus a `decode_error` column: NULL on success, a bounded
  * single-line reason on failure. Downstream either filters
  * `decode_error IS NULL` or routes the dead letters to their own sink —
  * both stay declarative, no task ever dies on data.
  */
object DeadLetter {

  /** Bounded, single-line rendering of a decode failure — the value that
    * lands in the `decode_error` column. Newlines/tabs stripped so the
    * column stays safe for line-oriented sinks; capped so a pathological
    * message can't bloat the row.
    */
  def render(e: Throwable): String = {
    val m = Option(e.getMessage).getOrElse("")
    (e.getClass.getSimpleName + (if (m.nonEmpty) ": " + m else ""))
      .replaceAll("[\\n\\r\\t]", " ").take(200)
  }

  /** Run one row's decode body, catching NonFatal only (an OOM must still
    * fail the task — swallowing it would turn memory pressure into silent
    * data loss).
    */
  def attempt[T](body: => T): Either[String, T] =
    try Right(body) catch { case NonFatal(e) => Left(render(e)) }
}
