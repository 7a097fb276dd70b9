package graft

import java.math.{BigDecimal => JBigDecimal}
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.BalanceUpsert
import graft.sinks.BalanceUpsert.BalanceRow

/** Executes the GENERATED upsert statement ([[BalanceUpsert.upsertSql]])
  * end-to-end against a real SQL engine. No live Postgres exists offline, but
  * DuckDB speaks the same `INSERT … ON CONFLICT (pk) DO UPDATE SET … EXCLUDED`
  * dialect (row-value comparison included), so the statement TEXT — previously
  * only string-asserted in `SinksSpec` and semantically mirrored by
  * [[BalanceUpsert.MemoryStore]] — is here prepared, parameter-bound in
  * [[BalanceUpsert.columns]] order, and executed row by row; the resulting
  * table must equal the MemoryStore folding the same deltas, column for
  * column. This is the closest offline analogue of the reference's deployed
  * Kafka-Connect JDBC upsert path (reference: README.md:273-297,
  * `insert.mode=UPSERT, pk.fields=account`).
  *
  * Runs through the same `python3` + duckdb toolchain the oracle gate uses
  * (ToolsSpec precedent); skips cleanly if it is absent.
  */
class BalanceUpsertDuckDbSpec extends AnyFunSuite {

  private def haveDuckDb: Boolean =
    try {
      new ProcessBuilder("python3", "-c", "import duckdb").start().waitFor() == 0
    } catch { case _: java.io.IOException => false }

  private def row(account: String, bal: String, ts: Long, idx: Int,
                  rid: String): BalanceRow =
    BalanceRow(account, new JBigDecimal(bal), new JBigDecimal(ts),
      s"bh-$ts", s"ch-$ts-$idx", idx, s"tx-$rid", rid)

  /** Delta sequence exercising every branch of the merge: fresh inserts,
    * additive conflicts whose provenance is newer (replace) and older (keep),
    * equal-timestamp ties broken by index_in_chunk and then receipt_id,
    * negative deltas, and 38-digit-scale balances.
    */
  private val deltas: Seq[BalanceRow] = Seq(
    row("alice", "1000000000000000000000000000000", 2000, 0, "r-a1"),
    row("bob", "5", 1000, 0, "r-b1"),
    // newer event: provenance replaced, balance added
    row("alice", "-250000000000000000000000000000", 3000, 0, "r-a2"),
    // older event: balance added, provenance kept
    row("alice", "7", 1500, 9, "r-a0"),
    // same ts as bob's stored row, higher index_in_chunk → newer
    row("bob", "-2", 1000, 3, "r-b2"),
    // same (ts, idx) as stored → receipt_id tiebreak ("r-b3" > "r-b2")
    row("bob", "10", 1000, 3, "r-b3"),
    // and one that loses the receipt_id tiebreak ("r-b0" < "r-b3")
    row("bob", "1", 1000, 3, "r-b0"),
    row("carol", "0", 500, 0, "r-c1"))

  test("generated ON CONFLICT SQL executed by DuckDB equals the MemoryStore merge") {
    assume(haveDuckDb, "python3+duckdb not available — SQL execution test skipped")

    val store = new BalanceUpsert.MemoryStore
    store.upsertAll(deltas)
    val expected = store.snapshot

    val dir = Files.createTempDirectory("upsert-duckdb")
    try {
      val sqlPath = dir.resolve("upsert.sql")
      Files.write(sqlPath, BalanceUpsert.upsertSql("balances").getBytes("UTF-8"))
      val tsv = deltas.map { d =>
        Seq(d.account, d.balance.toPlainString, d.blockTimestamp.toPlainString,
          d.blockHash, d.chunkHash, d.indexInChunk.toString,
          d.transactionHash, d.receiptId).mkString("\t")
      }.mkString("\n")
      val deltaPath = dir.resolve("deltas.tsv")
      Files.write(deltaPath, tsv.getBytes("UTF-8"))
      val script = dir.resolve("run_upsert.py")
      // the script executes the statement text verbatim — any drift between
      // the Scala-side dialect and a real engine fails here, not in prod
      Files.write(script,
        """import sys, duckdb
          |from decimal import Decimal
          |sql = open(sys.argv[1]).read()
          |con = duckdb.connect()
          |con.execute('''CREATE TABLE balances (
          |  account VARCHAR PRIMARY KEY, balance DECIMAL(38,0),
          |  block_timestamp DECIMAL(38,0), block_hash VARCHAR, chunk_hash VARCHAR,
          |  index_in_chunk INTEGER, transaction_hash VARCHAR, receipt_id VARCHAR)''')
          |for line in open(sys.argv[2]):
          |    a, bal, ts, bh, ch, idx, tx, rid = line.rstrip("\n").split("\t")
          |    # Decimal binding = the exact-value analogue of JDBC setBigDecimal
          |    # (a plain python int this wide would coerce through float64)
          |    con.execute(sql, [a, Decimal(bal), Decimal(ts), bh, ch, int(idx), tx, rid])
          |for r in con.execute("SELECT * FROM balances ORDER BY account").fetchall():
          |    print("\t".join(str(c) for c in r))
          |""".stripMargin.getBytes("UTF-8"))

      val proc = new ProcessBuilder("python3", script.toString,
        sqlPath.toString, deltaPath.toString).redirectErrorStream(true).start()
      val out = scala.io.Source.fromInputStream(proc.getInputStream).mkString
      val exit = proc.waitFor()
      assert(exit == 0, s"DuckDB rejected the generated upsert SQL (exit $exit):\n$out")

      val got = out.linesIterator.filter(_.nonEmpty).map { l =>
        val f = l.split("\t", -1)
        f(0) -> BalanceRow(f(0), new JBigDecimal(f(1)), new JBigDecimal(f(2)),
          f(3), f(4), f(5).toInt, f(6), f(7))
      }.toMap

      assert(got.keySet === expected.keySet)
      for ((acct, want) <- expected) {
        val g = got(acct)
        assert(g.balance.compareTo(want.balance) == 0,
          s"$acct balance: duckdb=${g.balance} store=${want.balance}")
        assert(g.blockTimestamp.compareTo(want.blockTimestamp) == 0, s"$acct ts")
        assert(g.blockHash === want.blockHash, s"$acct block_hash")
        assert(g.chunkHash === want.chunkHash, s"$acct chunk_hash")
        assert(g.indexInChunk === want.indexInChunk, s"$acct index_in_chunk")
        assert(g.transactionHash === want.transactionHash, s"$acct transaction_hash")
        assert(g.receiptId === want.receiptId, s"$acct receipt_id")
      }
    } finally {
      import scala.jdk.CollectionConverters._
      Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
    }
  }
}
