package graft.rentals

/** Scratch directories for sink round-trip queries — under the repo's
  * gitignored `target/` so nothing outside the project tree is touched.
  *
  * The base is suffixed with the JVM's pid so concurrent sessions (bench +
  * sbt test, interleaved suites) never race on the same directory — one
  * process reading a state parquet mid-overwrite by another. Paths are only
  * ever consumed inside the writing process (oracles recompute from base
  * tables, never from scratch), so the suffix is invisible to the gate.
  */
object Scratch {
  private val base = s"/root/repo/target/scratch/p${ProcessHandle.current().pid()}"
  def dir(name: String): String = s"$base/$name"
}
