package graft.sources

import scala.collection.mutable

/** Client seam for a Confluent-style schema registry — the id↔schema
  * interaction the reference's serde performs over HTTP (reference:
  * Schemas.java:113-136 configures registry url/auth for
  * SpecificAvroSerde). The serde code ([[AvroSerde.sinkFrameRegistered]],
  * [[AvroSerde.decodeRegistered]]) depends only on this trait, so a
  * connected deployment supplies the HTTP implementation (register = POST
  * /subjects/{subject}/versions, schemaById = GET /schemas/ids/{id}) without
  * editing any serde code; the in-memory implementation below is the offline
  * stand-in and the spec fixture.
  *
  * Implementations must be [[Serializable]]: the client rides into the
  * `mapPartitions` decode closure, where per-partition caching keeps lookups
  * to one per distinct schema id (the same access pattern Confluent's
  * deserializer has, so an HTTP impl sees registry traffic proportional to
  * schema count, not row count).
  */
trait SchemaRegistryClient extends Serializable {

  /** Register `schemaJson` under `subject` (idempotent: re-registering the
    * same schema returns the existing id) and return its global schema id.
    */
  def register(subject: String, schemaJson: String): Int

  /** The schema JSON registered under `id`; throws if unknown — decoding a
    * frame whose writer schema the registry has never seen is corrupt input,
    * not a recoverable condition.
    */
  def schemaById(id: Int): String
}

/** In-memory reference registry: ids assigned in registration order starting
  * at 1 (the Confluent convention), idempotent per canonical schema text,
  * thread-safe. A copy shipped into an executor closure serves lookups for
  * everything registered before capture — exactly the build-then-probe order
  * the serde uses.
  */
final class InMemorySchemaRegistry extends SchemaRegistryClient {
  private val byId = mutable.Map.empty[Int, String]
  private val idBySchema = mutable.Map.empty[(String, String), Int]

  override def register(subject: String, schemaJson: String): Int =
    synchronized {
      idBySchema.getOrElseUpdate((subject, schemaJson), {
        val id = byId.size + 1
        byId(id) = schemaJson
        id
      })
    }

  override def schemaById(id: Int): String =
    synchronized {
      byId.getOrElse(id,
        throw new NoSuchElementException(s"schema id $id not in registry"))
    }
}
