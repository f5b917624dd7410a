package graft.util

import org.apache.hadoop.conf.Configuration
import org.scalatest.funsuite.AnyFunSuite

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}

class SerializableHadoopConfSpec extends AnyFunSuite {

  private def conf(): Configuration = {
    val c = new Configuration(false)
    c.set("graft.test.key", "test-value")
    c
  }

  test("survives Java serialization") {
    val baos = new ByteArrayOutputStream()
    val out = new ObjectOutputStream(baos)
    out.writeObject(new SerializableHadoopConf(conf()))
    out.close()
    val in = new ObjectInputStream(new ByteArrayInputStream(baos.toByteArray))
    val back = in.readObject().asInstanceOf[SerializableHadoopConf]
    assert(back.value.get("graft.test.key") === "test-value")
  }

  test("value is rebuilt from the eager byte form (Kryo-shaped transport)") {
    // Kryo copies plain fields and skips Java read/write hooks — model
    // that by nulling the transient conf the way a field-serializer
    // round-trip would, and checking the byte form alone suffices
    val wrapper = new SerializableHadoopConf(conf())
    val f = classOf[SerializableHadoopConf].getDeclaredField("conf")
    f.setAccessible(true)
    f.set(wrapper, null)
    assert(wrapper.value.get("graft.test.key") === "test-value")
  }
}
