package graft.util

/** Registry of one-time on-disk state actually (re)built in this JVM —
  * bucketed staging tables ([[graft.plans.Bucketing.stageBucketedOnce]]),
  * IVF index builds ([[graft.operators.Similarity.ivfIndexFor]]). Bench
  * reports this set as the `staged` JSON field so a rebuild landing inside
  * a timed run is visible as one-time work, not mistaken for a query
  * regression (the r7 fingerprint-format change cost a phantom 7× on q48
  * exactly this way). Lives in util so producers (plans, operators) and
  * the consumer (Bench) stay decoupled.
  */
object Staging {
  val builtThisJvm: java.util.Set[String] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
}
