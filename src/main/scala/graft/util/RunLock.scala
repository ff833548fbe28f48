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
      val content = try new String(Files.readAllBytes(path), StandardCharsets.UTF_8)
      catch { case _: Exception => return false } // concurrently deleted: retry
      val stamp = try content.trim.toLong catch {
        case _: Exception =>
          // corrupt/empty stamp (a holder crashed between CREATE_NEW and the
          // content write): fall back to the file's mtime so the TTL still
          // reclaims it eventually — treating it as held-forever would
          // deadlock every future run on a one-byte artifact
          try Files.getLastModifiedTime(path).toMillis / 1000
          catch { case _: Exception => return false }
      }
      if (now() - stamp < ttlSeconds) return false
      // atomic reclaim: move the expired lock aside — exactly one waiter
      // wins the move and may recreate; the losers' moves throw and they
      // fall back to contending on CREATE_NEW below next round. Deleting
      // in place would let a second waiter delete the winner's FRESH lock.
      val tombstone = dir.resolve(s"graft-lock-$lockId.expired-$stamp")
      try Files.move(path, tombstone, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch { case _: Exception => return false }
      // verify we moved the lock we MEASURED: a late mover can otherwise
      // steal the fresh lock the reclaim winner just recreated (winner
      // moves, deletes the tombstone, recreates — then the loser's move
      // sees the recreated file). Content mismatch → put it back.
      val moved = try new String(Files.readAllBytes(tombstone), StandardCharsets.UTF_8)
      catch { case _: Exception => "" }
      if (moved != content) {
        try Files.move(tombstone, path, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch {
          case e: Exception =>
            // a third acquirer created a new lock in the microsecond the
            // name was vacant: fail LOUDLY — silent continuation would
            // leave two processes believing they hold the lock. (The
            // production DynamoDB impl has a true conditional put and no
            // such window.)
            throw new IllegalStateException(
              s"lock $lockId corrupted during reclaim; manual cleanup of $tombstone required", e)
        }
        return false
      }
      Files.deleteIfExists(tombstone)
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
