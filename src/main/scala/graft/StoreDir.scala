package graft

/** Per-user directory under `java.io.tmpdir` for the cross-JVM trained
  * stores (LM/DSIR model maps, IVF centroids, the brute-top-k memo).
  *
  * Why not bare tmpdir (r15 ADVICE): the stores are trusted inputs — a
  * quantizer loaded from disk silently shapes ANN results — and a
  * world-writable shared directory lets any other local user pre-create
  * or replace a store file at its deterministic path. Scoping the
  * stores to a per-user, owner-only (0700) subdirectory closes that:
  * another uid can neither pre-plant a path nor swap a committed store.
  * Pre-existing stores in the old shared location are simply retrained
  * once into the new directory.
  */
object StoreDir {

  /** The per-user store root, created on first use with owner-only
    * permissions and verified to actually belong to the current user
    * (an attacker-pre-created directory fails the ownership check
    * loudly instead of being silently trusted). */
  def dir(): java.io.File = {
    val user = sys.props.getOrElse("user.name", "anon")
    val d = new java.io.File(sys.props("java.io.tmpdir"), s"graft-$user")
    if (!d.exists()) { d.mkdirs(); () }
    require(d.isDirectory, s"store dir $d is not a directory")
    try {
      java.nio.file.Files.setPosixFilePermissions(d.toPath,
        java.nio.file.attribute.PosixFilePermissions.fromString("rwx------"))
      val owner = java.nio.file.Files.getOwner(d.toPath).getName
      require(owner == user, s"store dir $d owned by $owner, expected $user")
    } catch {
      // non-POSIX fs: no permission bits to set; ownership is moot
      case _: UnsupportedOperationException => ()
    }
    d
  }
}
