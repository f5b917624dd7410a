package graft.util

import org.apache.hadoop.conf.Configuration

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/**
 * A Hadoop `Configuration` that survives serialization, so
 * executor-side FileSystem work (e.g. Etl.withFileStatusMetadata) can
 * carry the session's conf — with its s3a/hdfs credentials and
 * filesystem settings — into tasks, the same way Spark's own
 * datasources ship theirs.
 *
 * The conf is captured EAGERLY as its Writable byte form in a plain
 * field, so the wrapper round-trips under both Java serialization and
 * Kryo (`spark.serializer=KryoSerializer` never calls
 * writeObject/readObject hooks — a hook-based wrapper deserializes to
 * null there; Spark registers its own SerializableConfiguration with a
 * special Kryo serializer for exactly that reason).
 */
final class SerializableHadoopConf(@transient private var conf: Configuration)
    extends Serializable {

  private val bytes: Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    val out = new DataOutputStream(baos)
    conf.write(out)
    out.flush()
    baos.toByteArray
  }

  /** The wrapped conf, rebuilt from its byte form after transport. */
  def value: Configuration = synchronized {
    if (conf == null) {
      conf = new Configuration(false)
      conf.readFields(new DataInputStream(new ByteArrayInputStream(bytes)))
    }
    conf
  }
}
