package graft

/** Idle-host reference times for [[Bench]]'s self-adjudication pass —
  * seconds, best-of-2, sf0.1 / local[32], measured on an idle host
  * (begin/mid/end probe spread < 2x) and refreshed whenever the suite
  * or a query's plan changes materially. Values are deliberately in a
  * separate file: they are DATA about the last idle run, not logic —
  * regenerate with
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt 'runMain graft.Bench'`
  * on a quiet host and paste the per-query map.
  */
object BenchIdleRef {
  val sf01: Map[String, Double] = Map.empty
}
