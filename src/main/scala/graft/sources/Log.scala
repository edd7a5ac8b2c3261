package graft.sources

import java.time.{OffsetDateTime, ZoneId}
import java.time.format.DateTimeFormatter

import org.json4s.JsonAST._
import org.json4s.jackson.JsonMethods

/** Structured JSON-Lines logging — the WRITER half of the reference's
  * etl/log.py (JsonFormatter + get_logger). [[RunLog.readLogDf]] already
  * consumes this format; producing it here makes the run-log path
  * self-contained: Runner/Catalog events → JSON lines → readLogDf →
  * batched retry upload.
  *
  * Event shape matches the reference formatter exactly:
  * `{time, level, name, message, ...extras}` — extras merge flat into
  * the event object (reference log.py JsonFormatter.format).
  */
object Log {

  /** The reference pipeline's audit timezone (load.py:56-60
    * `_now_iso_ec`): Ecuador local time, fixed UTC-05 (no DST). Sessions
    * stay pinned to UTC for cross-engine parity — this zone is applied
    * only when RENDERING run stamps.
    */
  val EcuadorZone: ZoneId = ZoneId.of("America/Guayaquil")

  private val IsoOffset = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ssXXX")

  /** ISO-8601 local time with offset — `YYYY-MM-DDTHH:MM:SS-05:00` for
    * the default zone, byte-compatible with the reference's run stamps.
    */
  def nowIsoLocal(zone: ZoneId = EcuadorZone,
      clock: java.time.Clock = java.time.Clock.systemUTC()): String =
    OffsetDateTime.now(clock.withZone(zone)).format(IsoOffset)

  private def toJValue(v: Any): JValue = v match {
    case null => JNull
    case s: String => JString(s)
    case b: Boolean => JBool(b)
    case i: Int => JLong(i.toLong)
    case l: Long => JLong(l)
    case d: Double => JDouble(d)
    case f: Float => JDouble(f.toDouble)
    case m: Map[_, _] =>
      JObject(m.toList.map { case (k, x) => String.valueOf(k) -> toJValue(x) })
    case xs: Iterable[_] => JArray(xs.toList.map(toJValue))
    case other => JString(String.valueOf(other))
  }

  /** One rendered event line (no trailing newline). Extras merge flat;
    * the four standard fields win on key collision, like the reference
    * (which sets them after merging args).
    */
  def eventLine(level: String, name: String, message: String,
      extras: Map[String, Any] = Map.empty,
      time: String = nowIsoLocal()): String = {
    val base = List(
      "time" -> JString(time),
      "level" -> JString(level),
      "name" -> JString(name),
      "message" -> JString(message))
    val extraFields = extras.toList
      .filterNot { case (k, _) => base.exists(_._1 == k) }
      .map { case (k, v) => k -> toJValue(v) }
    JsonMethods.compact(JsonMethods.render(JObject(base ++ extraFields)))
  }

  /** A logger bound to a name and sink(s) — stdout by default, plus an
    * append-mode local file when `logfile` is set (the reference's two
    * handlers; rotation is the platform's job here).
    */
  final class Logger private[Log] (name: String,
      sinks: Seq[String => Unit], zone: ZoneId) {
    private def emit(level: String, message: String, extras: Map[String, Any]): Unit = {
      val line = eventLine(level, name, message, extras, nowIsoLocal(zone))
      sinks.foreach(_.apply(line))
    }
    def info(message: String, extras: Map[String, Any] = Map.empty): Unit =
      emit("INFO", message, extras)
    def warning(message: String, extras: Map[String, Any] = Map.empty): Unit =
      emit("WARNING", message, extras)
    def error(message: String, extras: Map[String, Any] = Map.empty): Unit =
      emit("ERROR", message, extras)
  }

  /** Build a logger. `logfile` appends lines to a local path (created on
    * first write); pass a custom `sink` to capture lines in tests.
    */
  def get(name: String = "etl", logfile: Option[String] = None,
      sink: String => Unit = line => Console.out.println(line),
      zone: ZoneId = EcuadorZone): Logger = {
    val fileSink: Option[String => Unit] = logfile.map { path => line =>
      val w = new java.io.PrintWriter(new java.io.FileWriter(path, true))
      try w.println(line) finally w.close()
    }
    new Logger(name, Seq(sink) ++ fileSink, zone)
  }
}
