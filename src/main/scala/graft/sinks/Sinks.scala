package graft.sinks

import java.time.{Instant, ZoneOffset}
import java.time.format.DateTimeFormatter

/** K2/K3/K4/I5 — the run's outward-facing contract (reference
  * `address_etl/kafka.py:30-54`, `s3.py:13-30`, `metadata.py:9-31`,
  * headers `main_pls.py:37-56`), behind traits so the pipeline is testable
  * with fakes and a production deployment plugs in real clients. The
  * ordering guarantee (snapshot → upload → presign → publish, raise on
  * delivery error) lives in pipeline.EtlRun.
  */
object Sinks {

  /** K2 — artifact upload returning a presigned GET URL. */
  trait ArtifactStore {
    def upload(localPath: String, bucket: String, key: String,
               expirySeconds: Int): String
  }

  /** K3/I5 — single-record notification with headers; implementations MUST
    * flush synchronously and throw on delivery failure (at-least-once after
    * a durable artifact).
    */
  trait Notifier {
    def publish(topic: String, value: String, headers: Map[String, String]): Unit
  }

  /** In-memory artifact store: records uploads, mints deterministic
    * presigned-URL-shaped strings.
    */
  final class FakeArtifactStore extends ArtifactStore {
    val uploads = scala.collection.mutable.ArrayBuffer[(String, String, String)]()
    override def upload(localPath: String, bucket: String, key: String,
                        expirySeconds: Int): String = {
      uploads += ((localPath, bucket, key))
      s"https://$bucket.example/$key?presigned=1&expires=$expirySeconds"
    }
  }

  /** In-memory notifier mirroring the reference's FakeProducer
    * (`tests/test_kafka.py:6-42`): captures records, counts poll/flush,
    * raises after flush when a delivery error is injected.
    */
  final class CollectingNotifier(deliveryError: Option[String] = None) extends Notifier {
    val records = scala.collection.mutable.ArrayBuffer[(String, String, Map[String, String])]()
    var flushes = 0
    override def publish(topic: String, value: String, headers: Map[String, String]): Unit = {
      records += ((topic, value, headers))
      flushes += 1 // synchronous flush per publish, like the reference
      deliveryError.foreach(e => throw new RuntimeException(s"Failed to deliver Kafka message: $e"))
    }
  }

  /** Python `datetime.isoformat()` of a UTC instant: `+00:00` suffix,
    * microseconds only when non-zero — the reference's Kafka-header format
    * (`main_pls.py:33-34`), asserted exactly in `test_main_pls_kafka.py`.
    */
  def kafkaTimestamp(t: Instant): String = {
    // gate on MICROseconds: Python datetime carries µs only, so an instant
    // with 0 < nano < 1000 isoformats with NO fraction — `getNano == 0`
    // would print ".000000" and break the byte-exact header contract
    val base = if (t.getNano / 1000 == 0) "yyyy-MM-dd'T'HH:mm:ss" else "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    DateTimeFormatter.ofPattern(base).withZone(ZoneOffset.UTC).format(t) + "+00:00"
  }

  /** Brisbane-local ISO with +1000 offset — the S3-key / metadata format
    * (`main_pls.py:83, 195, 198`; Brisbane has no DST). Like Python's
    * `isoformat()`, microseconds appear iff non-zero — which also makes
    * runs finishing within the same SECOND produce distinct run ids /
    * S3 keys instead of silently overwriting each other's snapshots.
    */
  def brisbaneTimestamp(t: Instant): String = {
    val base = if (t.getNano / 1000 == 0) "yyyy-MM-dd'T'HH:mm:ss" else "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    DateTimeFormatter.ofPattern(base).withZone(ZoneOffset.ofHours(10)).format(t) + "+1000"
  }

  /** The 7 artifact headers, byte-exact to `main_pls.py:37-56`. */
  def buildArtifactHeaders(etlName: String, startedAt: Instant, finishedAt: Instant,
                           uploadedAt: Instant, durationSeconds: Double,
                           s3Bucket: String, s3Key: String,
                           presignedUrlExpirySeconds: Int): Map[String, String] = Map(
    "etl-name" -> etlName,
    "etl-started-at" -> kafkaTimestamp(startedAt),
    "etl-finished-at" -> kafkaTimestamp(finishedAt),
    "artifact-uploaded-at" -> kafkaTimestamp(uploadedAt),
    "etl-duration-seconds" -> f"$durationSeconds%.3f",
    "s3-bucket" -> s3Bucket,
    "s3-key" -> s3Key,
    "presigned-url-expiry-seconds" -> presignedUrlExpirySeconds.toString,
  )
}
