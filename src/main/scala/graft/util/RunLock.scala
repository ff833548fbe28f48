package graft.util

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

/** I4 — exactly-one-run concurrency lock (reference
  * `address_etl/dynamodb_lock.py:9-18`: DynamoDB conditional put with
  * TTL 24h, retry for 10 minutes at 60s intervals). The trait is the
  * contract; `FileRunLock` is the offline implementation (atomic
  * create-new as the conditional put; a production deployment plugs a
  * DynamoDB-backed implementation into the same trait).
  */
trait RunLock {
  /** Acquire or throw after the retry budget (reference raises). */
  def acquire(): Unit
  def release(): Unit
}

final class FileRunLock(
    lockId: String,
    dir: Path = Paths.get(System.getProperty("java.io.tmpdir")),
    ttlSeconds: Long = 86400,     // 24 hours
    retryTimeoutSeconds: Long = 600, // 10 minutes
    retryIntervalSeconds: Long = 60, // 1 minute
    now: () => Long = () => System.currentTimeMillis() / 1000,
    sleep: Long => Unit = s => Thread.sleep(s * 1000),
) extends RunLock {

  private val path = dir.resolve(s"graft-lock-$lockId")

  private def tryAcquire(): Boolean = {
    // expired lock is reclaimable (the TTL semantics of the reference)
    if (Files.exists(path)) {
      val stamp = new String(Files.readAllBytes(path), StandardCharsets.UTF_8).trim.toLong
      if (now() - stamp < ttlSeconds) return false
      Files.delete(path)
    }
    try {
      Files.write(path, now().toString.getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE_NEW)
      true
    } catch { case _: java.nio.file.FileAlreadyExistsException => false }
  }

  override def acquire(): Unit = {
    val deadline = now() + retryTimeoutSeconds
    while (!tryAcquire()) {
      if (now() + retryIntervalSeconds > deadline)
        throw new RuntimeException(s"Could not acquire lock $lockId within $retryTimeoutSeconds s")
      sleep(retryIntervalSeconds)
    }
  }

  override def release(): Unit = Files.deleteIfExists(path)
}
