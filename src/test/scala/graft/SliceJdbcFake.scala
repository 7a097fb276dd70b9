package graft

import java.sql.{Connection, PreparedStatement, SQLException}
import java.util.concurrent.ConcurrentHashMap

import graft.sinks.BalanceUpsert
import graft.sinks.BalanceUpsert.BalanceRow

/** A TRANSACTIONAL in-JVM fake database for executing the partition-parallel
  * exactly-once sink end-to-end (`StreamingPipeline.balancesToJdbcExactlyOnce`
  * → `foreachPartition` → `upsertSliceExactlyOnce`) without a live Postgres:
  * each `connection()` call returns an isolated transaction (tentative slice
  * claims + buffered upsert rows) that only mutates the shared committed
  * state on `commit` and discards everything on `rollback` — the property the
  * protocol's correctness actually rests on, which the non-transactional
  * `MemoryStore` twin cannot exhibit. All committed-state mutations are
  * serialized on the [[TxSliceDb]] instance, so 32 concurrent partition
  * transactions are safe.
  *
  * Crash injection (`crashOnSecondCommit`): the first commit of a second
  * slice transaction within one batch throws INSTEAD of committing — the
  * exact partial-failure window the per-slice journal exists for (some
  * slices of the batch committed, one was torn down mid-transaction). The
  * task fails, the streaming query dies, and a restart from the checkpoint
  * redelivers the batch: committed slices must skip on their claims, the
  * torn slice must apply.
  *
  * Executor closures can only capture serializable values, so tests park
  * instances in [[SliceDbRegistry]] (same-JVM `local[n]` pattern, as the
  * StreamBench harness feeds) and capture the registry key.
  */
final class TxSliceDb(crashOnSecondCommit: Boolean = false) {
  val store = new BalanceUpsert.MemoryStore
  private val journal = scala.collection.mutable.Set.empty[(String, Long, Int)]
  private val commitsPerBatch = scala.collection.mutable.Map.empty[Long, Int]
  @volatile var crashFired = false
  private var skipped = 0

  def committedSlices: Set[(String, Long, Int)] = synchronized(journal.toSet)
  def skippedClaims: Int = synchronized(skipped)

  def connection(): Connection = {
    val tentative = scala.collection.mutable.Set.empty[(String, Long, Int)]
    val pending = scala.collection.mutable.Buffer.empty[BalanceRow]
    var autoCommit = true

    def statement(): PreparedStatement = {
      val params = scala.collection.mutable.Map.empty[Int, Any]
      val batch = scala.collection.mutable.Buffer.empty[BalanceRow]
      proxy[PreparedStatement] { (name, args) =>
        name match {
          case "setString" | "setLong" | "setInt" | "setBigDecimal" =>
            params(args(0).asInstanceOf[Int]) = args(1); null
          case "addBatch" =>
            batch += BalanceRow(
              params(1).asInstanceOf[String],
              params(2).asInstanceOf[java.math.BigDecimal],
              params(3).asInstanceOf[java.math.BigDecimal],
              params(4).asInstanceOf[String],
              params(5).asInstanceOf[String],
              params(6).asInstanceOf[java.lang.Integer].intValue,
              params(7).asInstanceOf[String],
              params(8).asInstanceOf[String])
            null
          case "executeBatch" =>
            pending ++= batch
            val n = batch.size; batch.clear()
            Array.fill(n)(1)
          case "executeUpdate" =>
            if (params.keys.max == 2) { // 2-slot retention delete (gcJournal)
              val sinkId = params(1).asInstanceOf[String]
              val upTo = params(2).asInstanceOf[java.lang.Long].longValue
              TxSliceDb.this.synchronized {
                val dead = journal.filter(k => k._1 == sinkId && k._2 <= upTo)
                journal --= dead
                Int.box(dead.size)
              }
            } else { // the 4-slot slice claim
              val key = (params(1).asInstanceOf[String],
                params(2).asInstanceOf[java.lang.Long].longValue,
                params(3).asInstanceOf[java.lang.Integer].intValue)
              TxSliceDb.this.synchronized {
                if (journal.contains(key)) { skipped += 1; Int.box(0) }
                else { tentative += key; Int.box(1) }
              }
            }
          case "close" => null
          case other =>
            throw new UnsupportedOperationException(s"statement.$other")
        }
      }
    }

    proxy[Connection] { (name, args) =>
      name match {
        case "getAutoCommit" => Boolean.box(autoCommit)
        case "setAutoCommit" =>
          autoCommit = args(0).asInstanceOf[java.lang.Boolean]; null
        case "prepareStatement" => statement()
        case "commit" =>
          TxSliceDb.this.synchronized {
            val batchIds = tentative.map(_._2)
            if (crashOnSecondCommit && !crashFired &&
                batchIds.exists(b => commitsPerBatch.getOrElse(b, 0) == 1)) {
              crashFired = true
              throw new SQLException("injected crash committing a second slice")
            }
            store.upsertAll(pending.toSeq)
            journal ++= tentative
            batchIds.foreach(b =>
              commitsPerBatch(b) = commitsPerBatch.getOrElse(b, 0) + 1)
            tentative.clear(); pending.clear()
          }
          null
        case "rollback" => tentative.clear(); pending.clear(); null
        case "close" => null
        case other => throw new UnsupportedOperationException(s"connection.$other")
      }
    }
  }

  private def proxy[T](handler: (String, Array[AnyRef]) => AnyRef)(
      implicit ct: scala.reflect.ClassTag[T]): T =
    java.lang.reflect.Proxy.newProxyInstance(
      getClass.getClassLoader, Array(ct.runtimeClass),
      (_, m, a) => handler(m.getName, if (a == null) Array.empty else a)
    ).asInstanceOf[T]
}

/** Same-JVM handle registry: executor-side closures capture only the key. */
object SliceDbRegistry {
  private val dbs = new ConcurrentHashMap[String, TxSliceDb]()
  def register(id: String, db: TxSliceDb): Unit = dbs.put(id, db)
  def get(id: String): TxSliceDb = dbs.get(id)
  def remove(id: String): Unit = dbs.remove(id)
}
