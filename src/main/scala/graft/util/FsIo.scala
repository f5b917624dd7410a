package graft.util

/** Tiny Hadoop-FS I/O helpers shared by the stores' marker/commit
  * files and tokenizer interop — one copy of the read-whole-small-
  * file idiom instead of one per module. */
object FsIo {

  /** Read one SMALL file (a marker, a commit list, a tokenizer —
    * KBs, never data-shaped) whole, as UTF-8. */
  def readSmallFile(conf: org.apache.hadoop.conf.Configuration,
                    path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val buf = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
    val in = fs.open(p)
    try in.readFully(0, buf) finally in.close()
    new String(buf, "UTF-8")
  }
}
