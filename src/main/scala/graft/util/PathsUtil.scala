package graft.util

/** Shared path helpers for the driver-contract mains. */
object PathsUtil {

  /** Exception-safe same-directory test: canonical paths when resolvable
    * (so a trailing slash or symlinked spelling of the same dir compares
    * equal), degrading to absolute-path string equality if
    * canonicalization itself fails (an I/O error resolving a mount
    * component) — a bench warm-up guard must degrade, never crash the
    * run before the timed pass.
    */
  def samePath(a: String, b: String): Boolean =
    try new java.io.File(a).getCanonicalPath == new java.io.File(b).getCanonicalPath
    catch {
      case _: java.io.IOException =>
        new java.io.File(a).getAbsolutePath == new java.io.File(b).getAbsolutePath
    }
}
