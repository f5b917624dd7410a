package graft.util

import org.apache.hadoop.conf.Configuration

import java.io.{ObjectInputStream, ObjectOutputStream}

/**
 * A Hadoop `Configuration` that survives Java serialization, so
 * executor-side FileSystem work (e.g. Etl.withFileStatusMetadata) can
 * carry the session's conf — with its s3a/hdfs credentials and
 * filesystem settings — into tasks, the same way Spark's own
 * datasources ship theirs. (`Configuration` itself is `Writable` but
 * not `Serializable`; this is the standard wrapper pattern.)
 */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
