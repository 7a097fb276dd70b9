package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graft.GraftFunctions

/** Cluster-deployment entry point: inject graft's native SQL functions at
  * session build time via
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`), so every
  * session on the cluster — including pure-SQL clients — sees
  * `fingerprint`, `dot_product_f`, `shingles`, `minhash_sig`,
  * `hilbert_index`, `nfc_normalize`, and `mojibake_repair` without
  * driver-side registration calls.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction(
        (GraftFunctions.identifier(name), GraftFunctions.info(name), builder))
    }
}
