package graft.etl

/** Bounded retry with exponential backoff (D8,
  * /root/reference/python/etl/util/retry.py:1-56): the reference
  * retries extract once and copy/insert three times, sleeping
  * exponentially, and only for transient error classes. Spark already
  * retries tasks internally; this wraps whole JOB submissions. */
object Retry {

  /** Retry `body` up to `maxRetries` times after the first attempt,
    * backing off `baseDelayMs * 2^attempt`, when `isTransient` says
    * the failure is retryable. */
  def callWithRetry[T](maxRetries: Int, baseDelayMs: Long = 100,
                       isTransient: Throwable => Boolean = _ => true,
                       onRetry: (Int, Throwable) => Unit = (_, _) => ())
                      (body: => T): T = {
    var attempt = 0
    while (true) {
      try return body
      catch {
        case e: Throwable if attempt < maxRetries && isTransient(e) =>
          onRetry(attempt, e)
          Thread.sleep(baseDelayMs << attempt)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** The reference's per-step retry budget (default_settings.yaml:5-16):
    * extract 1, copy 3, insert 3. */
  val DefaultRetries: Map[String, Int] =
    Map("extract" -> 1, "copy" -> 3, "insert" -> 3)
}
