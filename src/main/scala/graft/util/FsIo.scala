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

  /** Write one SMALL file whole (create-overwrite — callers needing
    * crash atomicity across the write use [[writeSwapped]]). */
  def writeSmallFile(conf: org.apache.hadoop.conf.Configuration,
                     path: String, content: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val os = fs.create(p, true)
    try os.write(content.getBytes("UTF-8")) finally os.close()
  }

  /** CRASH-SAFE small-value update (the durable-counter protocol the
    * store seq/count files need — a bare create-overwrite truncates
    * first, so a crash mid-write loses the old value): the new value
    * lands whole at `<path>.swp`, THEN the old final deletes, THEN the
    * tmp renames in. [[readSwapped]] checks final-then-tmp, so every
    * crash point resolves to either the old or the new value — never
    * neither. Single-writer discipline (as every store mutation). */
  def writeSwapped(conf: org.apache.hadoop.conf.Configuration,
                   path: String, content: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + ".swp")
    val fs = p.getFileSystem(conf)
    val os = fs.create(tmp, true)
    try os.write(content.getBytes("UTF-8")) finally os.close()
    fs.delete(p, false)
    // a soft rename failure (false, no exception) would leave only the
    // tmp holding the committed value — readable today, but the NEXT
    // writeSwapped truncates the tmp first, so surface it NOW
    if (!fs.rename(tmp, p) && !fs.exists(p))
      throw new java.io.IOException(
        s"writeSwapped: rename $tmp -> $p failed; value only in tmp")
  }

  /** The current value of a [[writeSwapped]] file: the final path
    * wins; a crash between its delete and the rename leaves only the
    * fully-written tmp, which holds the newest committed value. */
  def readSwapped(conf: org.apache.hadoop.conf.Configuration,
                  path: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + ".swp")
    val fs = p.getFileSystem(conf)
    if (fs.exists(p)) Some(readSmallFile(conf, path))
    else if (fs.exists(tmp)) Some(readSmallFile(conf, path + ".swp"))
    else None
  }

  /** Drop both halves of a [[writeSwapped]] file. */
  def deleteSwapped(conf: org.apache.hadoop.conf.Configuration,
                    path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    fs.delete(p, false)
    fs.delete(new org.apache.hadoop.fs.Path(path + ".swp"), false)
  }
}
