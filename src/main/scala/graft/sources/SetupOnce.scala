package graft.sources

/** Once-per-JVM guard for runtime fixture layouts (a partitioned copy of a
  * table, a schema-drifted batch directory). Operators that demonstrate a
  * READ property — partition pruning, mergeSchema — need the layout to
  * exist, but the layout itself is write-once in production: a partitioned
  * warehouse table is laid down by one ingest job and scanned by thousands
  * of queries after it. Re-paying the layout write on every query run would
  * measure the fixture, not the operator. Verify and Bench both still pay
  * the write exactly once per JVM (first caller), so the sink path stays
  * exercised; the sink COST is measured where the sink IS the operator
  * (the csv/json/orc/xml roundtrip queries).
  *
  * The write runs inside the lock so a concurrent second caller blocks
  * until the layout is complete rather than reading a half-written
  * directory (parallel test suites share the JVM).
  */
object SetupOnce {
  private val done = scala.collection.mutable.HashSet[String]()

  def apply(key: String)(write: => Unit): Unit = synchronized {
    if (!done.contains(key)) { write; done += key }
  }

  /** The runtime-fixture directory for a dataset: keyed by basename PLUS a
    * canonical-path hash (two datasets that happen to share a directory
    * name — two `sf0.1`s under different parents — can never alias each
    * other's layouts; same reasoning as the bucketed-join table tag) PLUS
    * the JVM's pid. The pid term makes the whole /tmp/graft_rt tree
    * process-private: the in-JVM `done` guard is all the synchronization
    * the layout ever needs, and a concurrent JVM (tests beside a bench)
    * can never mode-overwrite a directory this JVM is still scanning.
    * Basename kept for human-debuggable paths.
    */
  def runtimeDir(sfDir: String, sub: String): String = {
    val f = new java.io.File(sfDir)
    val h = java.lang.Integer.toHexString(f.getCanonicalPath.hashCode)
    s"/tmp/graft_rt/${f.getName}_${h}_${ProcessHandle.current().pid()}/$sub"
  }
}
