package graft.tools

/** Print every registry key (SURVEY §2 sync checks). */
object KeyDump {
  def main(args: Array[String]): Unit =
    graft.Registry.all.map(_.key).sorted.foreach(k => println(s"KEY $k"))
}
