package graft.tools

import java.io.{BufferedInputStream, DataInputStream, EOFException, FileInputStream, InputStream}

/** Streaming scanner for JVM binary heap dumps (`.hprof`, the
  * `-XX:+HeapDumpOnOutOfMemoryError` format) — the forensic half of the
  * scale-soak harness. An OOM'd soak leg leaves a multi-GB dump; the
  * question it must answer is always the same: WHAT is occupying the
  * heap (which classes, which arrays, how big is the biggest single
  * allocation)? Desktop analyzers (MAT/VisualVM) are not in this
  * container, so this tool answers it from the command line in one
  * pass, constant memory, no temp files:
  *
  * {{{
  * sbt "runMain graft.tools.HprofScan /tmp/.../java_pid27318.hprof"
  * }}}
  *
  * prints a shallow-size histogram by class (instances, object arrays,
  * primitive arrays) and the top-N largest individual arrays — which is
  * exactly the evidence that closed the r12 50M OOM: the dump's
  * dominant single allocations were 128 MiB `long[16777216]` sort
  * pointer arrays, one per executor task, matching the "GCLocker …
  * allocating 16777218 words" log line.
  *
  * Parses the public HPROF 1.0.2 binary format (documented in the JDK's
  * `hprof_b_spec.html` / `heapDumper.cpp`): top-level records are
  * (tag u1, time u4, length u4, body); heap contents live in
  * HEAP_DUMP/HEAP_DUMP_SEGMENT records as subrecords. Only LOAD_CLASS,
  * UTF8 (for class names), CLASS_DUMP (to skip correctly and to size
  * statics), INSTANCE_DUMP, OBJECT_ARRAY_DUMP and PRIMITIVE_ARRAY_DUMP
  * are decoded; everything else is skipped by its declared length.
  * Shallow sizes only — retained-size dominator trees need the full
  * object graph in memory, which defeats the point on a dump larger
  * than this JVM's heap.
  */
object HprofScan {

  /** Per-key accumulator: instance/array count + shallow bytes. */
  final class Acc(var count: Long = 0L, var bytes: Long = 0L) {
    def add(b: Long): Unit = { count += 1; bytes += b }
  }

  case class BigArray(bytes: Long, desc: String)

  case class Report(
      idSize: Int,
      classHisto: Map[String, Acc],
      biggest: Seq[BigArray],
      totalBytes: Long) {

    def render(topClasses: Int = 30, topArrays: Int = 15): String = {
      val sb = new StringBuilder
      def gb(b: Long) = f"${b / 1073741824.0}%8.3f GiB"
      def mb(b: Long) = f"${b / 1048576.0}%9.2f MiB"
      sb ++= f"total shallow heap: ${gb(totalBytes)} across ${classHisto.valuesIterator.map(_.count).sum}%,d objects%n%n"
      sb ++= f"top $topClasses classes by shallow bytes:%n"
      classHisto.toSeq.sortBy(-_._2.bytes).take(topClasses).foreach {
        case (name, a) =>
          sb ++= f"  ${mb(a.bytes)}  ${a.count}%12d  $name%n"
      }
      sb ++= f"%ntop $topArrays largest single arrays:%n"
      biggest.take(topArrays).foreach { b =>
        sb ++= f"  ${mb(b.bytes)}  ${b.desc}%n"
      }
      sb.result()
    }
  }

  private val primNames = Map[Int, (String, Int)](
    4 -> ("boolean", 1), 5 -> ("char", 2), 6 -> ("float", 4),
    7 -> ("double", 8), 8 -> ("byte", 1), 9 -> ("short", 2),
    10 -> ("int", 4), 11 -> ("long", 8))

  def scan(path: String, keepArrays: Int = 64): Report = {
    val in = new DataInputStream(
      new BufferedInputStream(new FileInputStream(path), 1 << 22))
    try scan(in, keepArrays) finally in.close()
  }

  def scan(in: DataInputStream, keepArrays: Int): Report = {
    // header: nul-terminated version string, u4 idSize, u8 timestamp
    val ver = new StringBuilder
    var b = in.read()
    while (b > 0) { ver += b.toChar; b = in.read() }
    require(ver.startsWith("JAVA PROFILE"), s"not an hprof file: $ver")
    val idSize = in.readInt()
    require(idSize == 4 || idSize == 8, s"unsupported id size $idSize")
    in.readLong() // timestamp

    def readId(): Long = if (idSize == 8) in.readLong()
      else in.readInt().toLong & 0xffffffffL

    val strings = new java.util.HashMap[Long, String]()
    val classNames = new java.util.HashMap[Long, Long]() // classObjId -> nameId
    val histo = scala.collection.mutable.HashMap.empty[String, Acc]
    // min-heap of the biggest single arrays seen
    val big = new java.util.PriorityQueue[BigArray](
      keepArrays + 1, (a: BigArray, c: BigArray) => java.lang.Long.compare(a.bytes, c.bytes))
    var total = 0L

    def className(classObjId: Long): String = {
      val nameId = classNames.get(classObjId)
      val n = if (nameId == null) null else strings.get(nameId)
      val raw = if (n == null) s"class@0x${classObjId.toHexString}" else n
      raw.replace('/', '.')
    }
    def bump(key: String, bytes: Long): Unit = {
      histo.getOrElseUpdate(key, new Acc()).add(bytes)
      total += bytes
    }
    def offerBig(bytes: Long, desc: String): Unit = {
      big.offer(BigArray(bytes, desc))
      if (big.size > keepArrays) big.poll()
    }
    def valueSize(ty: Int): Int =
      if (ty == 2) idSize else primNames.get(ty).map(_._2).getOrElse(
        sys.error(s"unknown basic type $ty"))

    def scanHeapSegment(len: Long): Unit = {
      var remaining = len
      def take(n: Long): Unit = { remaining -= n }
      while (remaining > 0) {
        val sub = in.readUnsignedByte(); take(1)
        sub match {
          case 0xFF | 0x05 | 0x07 => // rootUnknown/stickyClass/monitorUsed: ID
            in.skipNBytes(idSize); take(idSize)
          case 0x01 => // jniGlobal: ID + ID
            in.skipNBytes(2L * idSize); take(2L * idSize)
          case 0x02 | 0x03 | 0x08 => // jniLocal/javaFrame/threadObj: ID + u4 + u4
            in.skipNBytes(idSize + 8L); take(idSize + 8L)
          case 0x04 | 0x06 => // nativeStack/threadBlock: ID + u4
            in.skipNBytes(idSize + 4L); take(idSize + 4L)
          case 0x20 => // CLASS_DUMP
            val classObj = readId()
            in.readInt() // stack serial
            in.skipNBytes(6L * idSize) // super, loader, signers, pd, res1, res2
            val instSize = in.readInt()
            take(idSize + 4 + 6L * idSize + 4)
            val cpCount = in.readUnsignedShort(); take(2)
            var i = 0
            while (i < cpCount) {
              in.readUnsignedShort() // cp index
              val ty = in.readUnsignedByte()
              val vs = valueSize(ty)
              in.skipNBytes(vs); take(3L + vs); i += 1
            }
            val staticCount = in.readUnsignedShort(); take(2)
            i = 0
            while (i < staticCount) {
              in.skipNBytes(idSize)
              val ty = in.readUnsignedByte()
              val vs = valueSize(ty)
              in.skipNBytes(vs); take(idSize + 1L + vs); i += 1
            }
            val fieldCount = in.readUnsignedShort(); take(2)
            in.skipNBytes(fieldCount * (idSize + 1L))
            take(fieldCount * (idSize + 1L))
            // record the class object itself (tiny, but keeps counts honest)
            bump(s"class ${className(classObj)}", instSize.toLong.max(0L))
          case 0x21 => // INSTANCE_DUMP
            readId() // obj id
            in.readInt() // stack serial
            val classObj = readId()
            val nBytes = in.readInt()
            in.skipNBytes(nBytes.toLong)
            take(idSize + 4L + idSize + 4L + nBytes)
            bump(className(classObj), nBytes.toLong + 2L * idSize)
          case 0x22 => // OBJECT_ARRAY_DUMP
            readId()
            in.readInt()
            val len2 = in.readInt()
            val arrClass = readId()
            in.skipNBytes(len2.toLong * idSize)
            take(idSize + 8L + idSize + len2.toLong * idSize)
            val bytes = len2.toLong * idSize + 2L * idSize + 4L
            val nm = className(arrClass)
            bump(nm, bytes)
            offerBig(bytes, s"$nm[$len2]")
          case 0x23 => // PRIMITIVE_ARRAY_DUMP
            readId()
            in.readInt()
            val len2 = in.readInt()
            val ty = in.readUnsignedByte()
            val (nm, es) = primNames.getOrElse(ty,
              sys.error(s"unknown primitive array type $ty"))
            in.skipNBytes(len2.toLong * es)
            take(idSize + 8L + 1L + len2.toLong * es)
            val bytes = len2.toLong * es + 2L * idSize + 4L
            bump(s"$nm[]", bytes)
            offerBig(bytes, s"$nm[$len2]")
          case other =>
            sys.error(f"unknown heap subrecord tag 0x$other%02x with " +
              s"$remaining bytes left in segment")
        }
      }
      require(remaining == 0, s"heap segment over-read by ${-remaining} bytes")
    }

    try {
      while (true) {
        val tag = in.read()
        if (tag < 0) throw new EOFException()
        in.readInt() // time
        val len = in.readInt().toLong & 0xffffffffL
        tag match {
          case 0x01 => // UTF8: ID + chars
            val id = readId()
            val buf = new Array[Byte]((len - idSize).toInt)
            in.readFully(buf)
            strings.put(id, new String(buf, java.nio.charset.StandardCharsets.UTF_8))
          case 0x02 => // LOAD_CLASS
            in.readInt() // class serial
            val classObj = readId()
            in.readInt() // stacktrace serial
            val nameId = readId()
            classNames.put(classObj, nameId)
          case 0x0C | 0x1C => scanHeapSegment(len) // HEAP_DUMP / SEGMENT
          case _ => in.skipNBytes(len) // everything else
        }
      }
    } catch { case _: EOFException => () }

    val arr = new Array[BigArray](big.size)
    var i = arr.length - 1
    while (i >= 0) { arr(i) = big.poll(); i -= 1 }
    Report(idSize, histo.toMap, arr.toSeq, total)
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: HprofScan <dump.hprof> [topClasses] [topArrays]")
    val topC = if (args.length > 1) args(1).toInt else 30
    val topA = if (args.length > 2) args(2).toInt else 15
    val t0 = System.nanoTime()
    val rep = scan(args(0))
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"scanned ${args(0)} in $sec%.1f s (idSize=${rep.idSize})")
    println(rep.render(topC, topA))
  }
}
