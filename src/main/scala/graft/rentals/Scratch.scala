package graft.rentals

/** Scratch directories for sink round-trip queries — under the repo's
  * gitignored `target/` so nothing outside the project tree is touched.
  *
  * The base is suffixed with the JVM's pid so concurrent sessions (bench +
  * sbt test, interleaved suites) never race on the same directory — one
  * process reading a state parquet mid-overwrite by another. Contract for
  * paths that LEAK INTO ORACLE SQL (the zori CSV fixture does): the files
  * must outlive the writing process until the oracle compare has run —
  * scratch is only safe to clean between full gate runs, never between a
  * Verify dump and its DuckDB replay.
  */
object Scratch {
  // anchored at the working directory, not a hardcoded checkout path —
  // the gate runs from the project root by contract
  private val base = s"${sys.props("user.dir")}/target/scratch/p${ProcessHandle.current().pid()}"
  def dir(name: String): String = s"$base/$name"
}
