package graft.core

import scala.collection.concurrent.TrieMap

/** Session-scoped memo for expensive deterministic intermediates that
  * several registry queries share (q31's fitted CV OOF reused by q72's
  * metric replay; q34's MinHash near-dup pairs reused by q66's cluster
  * pass). Keys embed the Spark applicationId so a cached DataFrame is
  * never served to a different session. `clear()` lets the bench reset
  * between repetitions so every pass pays full cost — the memo is a
  * within-session reuse optimization, not a benchmark shortcut.
  */
object Memo {
  private val store = TrieMap.empty[String, Any]

  def getOrElseUpdate[T](key: String)(value: => T): T =
    store.getOrElseUpdate(key, value).asInstanceOf[T]

  def clear(): Unit = store.clear()
}
