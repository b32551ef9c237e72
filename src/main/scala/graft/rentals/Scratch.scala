package graft.rentals

/** Scratch directories for sink round-trip queries — under the repo's
  * gitignored `target/` so nothing outside the project tree is touched.
  */
object Scratch {
  private val base = "/root/repo/target/scratch"
  def dir(name: String): String = s"$base/$name"
}
