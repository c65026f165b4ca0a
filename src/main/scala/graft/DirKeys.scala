package graft

/** Canonical short keys for data directories — shared by every module
  * that namespaces persisted artifacts on an input dir (the LSH index
  * tables, the persisted IVF index). One definition so a future
  * canonicalization fix cannot silently diverge the two key spaces.
  */
object DirKeys {

  /** Canonical absolute form of a path: symlink-resolved when the path
    * exists, normalized-absolute otherwise.
    */
  def canonical(d: String): String = {
    val p = java.nio.file.Paths.get(d)
    try p.toRealPath().toString
    catch { case _: java.io.IOException => p.toAbsolutePath.normalize.toString }
  }

  /** 16-hex-char sha-256 prefix over the canonical path plus any extra
    * salt parts (e.g. a data-file freshness stamp).
    */
  def digest(d: String, salt: String*): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest((canonical(d) +: salt).mkString("|").getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString
}
