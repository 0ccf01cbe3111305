package graft.mr

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets.UTF_8

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame

/** Out-of-process handler execution — the Spark re-expression of the
  * reference's pluggable handler *processor* axis (reference:
  * mr/handlers/processors/processor.py:1 `Processor.compile/run`;
  * python.py:13 compiles handler source pushed at runtime and runs it
  * in-process). Compiled Scala cannot exec pushed source, and an
  * in-JVM `eval` would be the wrong trade anyway; the axis the
  * reference actually offers — "run this handler in another runtime" —
  * maps to the Hadoop-streaming / `RDD.pipe` model: one external
  * process per partition, rows streamed through stdin/stdout as
  * JSON lines. Any language with a stdin loop slots in, no worker
  * redeploy (the command ships in the [[Handlers.HandlerDef]], like
  * the reference's source push).
  *
  * Scale shape: the process is spawned per TASK on the executor
  * (never on the driver), IO is streaming in both directions (a
  * dedicated feeder thread prevents the classic stdin/stdout pipe
  * deadlock), and an empty partition spawns nothing. A non-zero exit
  * fails the task loudly — Spark retries it like any task failure,
  * which is exactly the reference's NSQ redelivery contract.
  *
  * The row contract is honest about schema: input rows cross as
  * `toJSON` lines; output is one `line: string` row per stdout line
  * (parse downstream with `from_json` against a declared schema —
  * schema inference on arbitrary subprocess output would be a silent
  * correctness hole).
  */
object Processors {

  /** Compile a command spec into a registerable DataFrame transform
    * (the `Processor.compile` surface). `env` entries are set on the
    * child's environment. */
  def pipe(cmd: Seq[String],
      env: Map[String, String] = Map.empty): DataFrame => DataFrame = { df =>
    import df.sparkSession.implicits._
    df.toJSON.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else {
        val pb = new ProcessBuilder(cmd.asJava)
        env.foreach { case (k, v) => pb.environment().put(k, v); () }
        // stderr → the executor's own stderr (task log). Without this
        // a chatty child fills the ~64 KB OS pipe buffer and blocks,
        // deadlocking the task with no failure surfaced — the same
        // reason Hadoop streaming drains stderr.
        pb.redirectError(ProcessBuilder.Redirect.INHERIT)
        val p = pb.start()
        // kill the child if the task dies mid-stream (cancellation,
        // upstream failure) — never leak subprocesses on executors
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit] { _ =>
            if (p.isAlive) { p.destroyForcibly(); () }
          })
        // A feeder failure must not be swallowed: a mid-stream write
        // error other than the child closing its stdin early (a
        // legitimate move — think `head`) means the child saw a
        // truncated input and may still exit 0 — silent truncation
        // accepted as success. Captured here, rethrown after waitFor.
        @volatile var feederErr: Throwable = null
        val feeder = new Thread(() => {
          val out = new BufferedWriter(
            new OutputStreamWriter(p.getOutputStream, UTF_8))
          try {
            try it.foreach { l => out.write(l); out.newLine() }
            finally out.close()
          } catch { case t: Throwable => feederErr = t }
        }, "graft-pipe-feeder")
        feeder.setDaemon(true)
        feeder.start()
        def childClosedStdin(t: Throwable): Boolean = t match {
          case io: java.io.IOException =>
            val m = Option(io.getMessage).getOrElse("")
            m.contains("Broken pipe") || m.contains("Stream closed") ||
              m.contains("pipe closed")
          case _ => false
        }
        val in = new BufferedReader(
          new InputStreamReader(p.getInputStream, UTF_8))
        Iterator.continually(in.readLine()).takeWhile(_ != null) ++ {
          // runs after stdout drains: surface the child's verdict
          val code = p.waitFor()
          feeder.join()
          if (code != 0)
            throw new java.io.IOException(
              s"piped handler '${cmd.mkString(" ")}' exited $code")
          if (feederErr != null && !childClosedStdin(feederErr))
            throw new java.io.IOException(
              s"feeding piped handler '${cmd.mkString(" ")}' failed " +
                "mid-stream (child saw truncated input)", feederErr)
          Iterator.empty
        }
      }
    }.toDF("line")
  }

  /** Register a piped handler under the versioned registry — the
    * reference's runtime handler push for a non-JVM runtime. */
  def registerPiped(name: String, version: Long, description: String,
      cmd: Seq[String], env: Map[String, String] = Map.empty): Boolean =
    Handlers.register(
      Handlers.HandlerDef(name, version, description, pipe(cmd, env)))
}
