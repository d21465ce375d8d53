package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's high-level extraction pipeline contract (reference M8:
  * hl_extractor/hl_calc.py:183-231 poll loop + :50-129 subprocess batches):
  * documents are fed to an EXTERNAL binary in chunks of at most
  * [[MaxItemsPerProcess]] per process invocation, and a document the binary
  * produced no usable output for still yields an empty `{}` result — the
  * processed-but-failed marking (db/data.py:393-404) that keeps it from
  * being re-queued forever.
  *
  * Spark-first shape: the driver never sees a document — each task walks its
  * partition in ≤20-doc chunks and runs one subprocess per chunk
  * (`ProcessBuilder` inside `mapPartitions`; the same shape as `rdd.pipe`
  * but with the reference's per-call batching, which `pipe`'s
  * one-process-per-partition contract can't express). Executor parallelism
  * replaces the reference's thread pool (hl_calc.py:202-209).
  */
object PipeExtractor {

  /** Reference DOCUMENTS_PER_QUERY (hl_calc.py:30) — the poll-batch size of
    * the queue scan feeding this operator (J4). */
  val DocumentsPerQuery = 100

  /** Reference MAX_ITEMS_PER_PROCESS (hl_calc.py:32). */
  val MaxItemsPerProcess = 20

  /** Run `command` over (id, payload) rows, ≤[[MaxItemsPerProcess]] docs per
    * process call. Line protocol (the file-per-doc contract of the
    * reference, flattened to streams): stdin gets one `id\tpayload` line per
    * doc (payload newlines pre-escaped by the caller); the binary emits
    * `id\tresult` lines; ids it stays silent about come back as `{}`.
    *
    * Deadlock posture: stderr is discarded (the reference pipes the
    * extractor's output to devnull, hl_calc.py:107-110 — an undrained
    * stderr pipe would block a chatty binary), and stdin is fed from a
    * writer thread while this thread reads stdout, so a binary that
    * streams results while consuming input can't wedge both pipes however
    * large the documents are. A non-zero exit fails the task (retries
    * preserve correctness: output depends only on input rows). */
  def extract(spark: SparkSession, docs: DataFrame,
      command: Seq[String]): DataFrame = {
    import spark.implicits._
    val cmd = command.toList
    docs.selectExpr("CAST(id AS LONG) AS id", "CAST(payload AS STRING) AS payload")
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.grouped(MaxItemsPerProcess).flatMap { batch =>
          val proc = new ProcessBuilder(cmd: _*)
            .redirectError(ProcessBuilder.Redirect.DISCARD)
            .start()
          @volatile var writeError: Throwable = null
          val writer = new Thread(() => {
            try {
              val stdin = new java.io.BufferedWriter(
                new java.io.OutputStreamWriter(proc.getOutputStream, "UTF-8"))
              batch.foreach { case (id, payload) =>
                stdin.write(s"$id\t${payload.replace("\n", " ")}")
                stdin.newLine()
              }
              stdin.close()
            } catch { case t: Throwable => writeError = t }
          }, "graft-pipe-writer")
          writer.setDaemon(true)
          writer.start()
          val results = scala.io.Source
            .fromInputStream(proc.getInputStream, "UTF-8")
            .getLines().flatMap { line =>
              val i = line.indexOf('\t')
              if (i <= 0) None
              else line.substring(0, i).toLongOption.map(_ -> line.substring(i + 1))
            }.toMap
          writer.join()
          val exit = proc.waitFor()
          if (exit != 0)
            throw new IllegalStateException(s"extractor exited with $exit")
          if (writeError != null)
            throw new IllegalStateException("failed feeding extractor stdin",
              writeError)
          // every input id is answered: missing output → "{}" marks the doc
          // processed-but-failed, mirroring db/data.py:393-404
          batch.map { case (id, _) => (id, results.getOrElse(id, "{}")) }
        }
      }.toDF("id", "hl_data")
  }
}
