package graft.checks

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator
import org.scalatest.funsuite.AnyFunSuite

/** D6 mailer specs: the syntactic tier's validator, the severity
  * ladder, and the cache guarantee (one probe per distinct address
  * regardless of how many pages cite it).
  */
class MailerCacheSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("syntactic validator: accepts normal addresses, rejects the planted malformations") {
    assert(Checks.mailValidSyntax("user7@example.test"))
    assert(Checks.mailValidSyntax("first.last+tag@sub.domain.test"))
    assert(!Checks.mailValidSyntax("user7@@example..test")) // WorldGen's planted invalid
    assert(!Checks.mailValidSyntax("no-at-sign.test"))
    assert(!Checks.mailValidSyntax("user@nodot"))
    assert(!Checks.mailValidSyntax(".leadingdot@example.test"))
    assert(!Checks.mailValidSyntax("user@-example.test"))
    assert(!Checks.mailValidSyntax(null))
    assert(Checks.mailSeverity("user7@example.test") == 0.8)
    assert(Checks.mailSeverity("user7@@example..test") == 0.3)
  }

  test("severity ladder matches mailer.py __severities[sum]") {
    assert(MailerCache.severity(false, false, false) == 0.3)
    assert(MailerCache.severity(true, false, false) == 0.8)
    assert(MailerCache.severity(true, true, false) == 0.9)
    assert(MailerCache.severity(true, true, true) == 1.0)
  }

  test("validationCache probes each distinct address exactly once (the lru_cache guarantee)") {
    val acc = new LongAccumulator
    spark.sparkContext.register(acc, "probes")
    class CountingProbe extends MailProbe {
      def probe(addr: String): MailProbeResult = {
        acc.add(1L); StubMailProbe.probe(addr)
      }
    }
    // 120 citations of 10 distinct addresses (plus nulls to ignore)
    val df = spark.range(120)
      .selectExpr("CASE WHEN id % 12 = 11 THEN NULL ELSE concat('user', id % 10, '@example.test') END AS addr")
    val cache = MailerCache.validationCache(df, "addr", new CountingProbe,
      checkMx = true, checkExists = true)
    val rows = cache.collect()
    assert(rows.length == 10, s"one cache row per distinct address: ${rows.length}")
    assert(acc.value == 10L, s"one probe per distinct address, got ${acc.value}")
    // stub honors accepted -> mxFound, so verify implies mx
    rows.foreach { r =>
      assert(!r.getBoolean(3) || r.getBoolean(2), s"verify implies mx: $r")
      assert(r.getBoolean(1), "all synthesized addresses are syntactically valid")
    }
    // with both tiers off the probe is never invoked
    acc.reset()
    val pure = MailerCache.validationCache(df, "addr", new CountingProbe)
    assert(pure.count() == 10 && acc.value == 0L,
      "syntax-only tier must not probe")
  }
}
