package graft.tools

/** Best-effort persistence for benchmark/profile artifact lines.
  *
  * The round driver captures only a ~2000-char stdout TAIL, so any
  * multi-line artifact risks truncation; tools therefore also write
  * their full output to a file under `target/`. The write must never
  * cost the stdout artifact — a read-only `target/` degrades to a
  * stderr warning, not an abort. (Shared by [[graft.Bench]] and
  * [[ShuffleProfile]]; previously each carried its own copy.)
  */
object ArtifactFile {
  def write(path: String, content: String): Unit =
    try {
      val p = java.nio.file.Paths.get(path)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p,
        content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Throwable =>
      System.err.println(s"[artifact] $path write failed: ${e.getMessage}")
    }
}
