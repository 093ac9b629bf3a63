package graft.checks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One network probe's verdict for an address: did a DNS MX record
  * resolve, and did the SMTP server accept the mailbox (RCPT TO).
  */
case class MailProbeResult(mxFound: Boolean, accepted: Boolean)

/** The mx/exists probe behind [[MailerCache]] — DNS + SMTP, an
  * external service exactly like the multimodal codec's image
  * libraries, so the sandbox build ships a declared STUB
  * ([[StubMailProbe]]); the Spark-side shape (distinct → probe once →
  * broadcast verdicts) is the real, tested part.
  */
trait MailProbe extends Serializable {
  def probe(addr: String): MailProbeResult
}

/** Declared stub prober: deterministic on the address bytes, never
  * touches the network, honors `accepted → mxFound` (an SMTP accept
  * implies the MX resolved — mailer.py:58-62's tier ordering).
  */
object StubMailProbe extends MailProbe {
  def probe(addr: String): MailProbeResult = {
    val h = org.apache.spark.unsafe.types.UTF8String.fromString(addr).hashCode()
    val mx = (h & 1) == 0
    MailProbeResult(mxFound = mx, accepted = mx && (h & 2) == 0)
  }
}

/** D6's cache tier. The reference memoizes `__validate(mail)` PER
  * ADDRESS (`functools.lru_cache`, mailer.py:57-63) because the mx and
  * exists tiers are network I/O — the same address on a million pages
  * must cost one probe. The distributed analog at 10^10 pages inverts
  * the order: dedupe addresses FIRST (a shuffle on the address — the
  * cache key — so each distinct address lands on exactly one
  * partition), probe each address exactly once there, and broadcast
  * the small verdict table back onto defect emission. The syntactic
  * bottom tier needs none of this (it is a codegen'd regex, cheaper
  * than any join — Checks.mailValidRegex); this path exists for the
  * tiers where a probe costs milliseconds of network, not
  * nanoseconds of CPU.
  */
object MailerCache {

  /** The reference's severity ladder (mailer.py:14,47):
    * `__severities[is_valid + mx + verify]`.
    */
  def severity(valid: Boolean, mx: Boolean, verify: Boolean): Double =
    Seq(0.3, 0.8, 0.9, 1.0)(Seq(valid, mx, verify).count(identity))

  /** Build the validation cache: one row per DISTINCT address of
    * `addrCol`, probed exactly once (mailer.py's lru_cache guarantee,
    * made global instead of per-executor by the distinct() shuffle).
    * Tier semantics follow setConf/__validate: `checkExists` implies
    * the mx check; with both off the probe is never invoked and the
    * cache is pure syntax. Returns (addr, valid, mx, verify) — join it
    * (broadcast: distinct addresses ≪ pages) onto the defect stream
    * and feed [[severity]].
    */
  def validationCache(df: DataFrame, addrCol: String, probe: MailProbe,
      checkMx: Boolean = false, checkExists: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val addrs = df.select(col(addrCol).cast("string").as("addr"))
      .where(col("addr").isNotNull).distinct().as[String]
    if (!checkMx && !checkExists) {
      // pure-syntax tier: the codegen'd rlike column (the exact regex
      // whose serial twin is Checks.mailValidSyntax — .find() semantics
      // on both), not a typed map per address
      addrs.toDF("addr").select(col("addr"),
        col("addr").rlike(Checks.mailValidRegex).as("valid"),
        lit(false).as("mx"), lit(false).as("verify"))
    } else {
      addrs.map { a =>
        val r = probe.probe(a)
        val verify = checkExists && r.mxFound && r.accepted
        val mx = r.mxFound
        (a, Checks.mailValidSyntax(a), mx, verify)
      }.toDF("addr", "valid", "mx", "verify")
    }
  }
}
