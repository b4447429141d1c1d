package graft

/** In-test WAV byte generation shared by AudioOpsSpec and the streaming
  * audio-dedup spec: minimal canonical RIFF + fmt(PCM) + data, 16-bit LE.
  */
object WavGen {

  /** Interleaved input for multi-channel. */
  def wavBytes(samples: Array[Short], channels: Int = 1,
      sampleRate: Int = 8000): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort)
      .putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  def square(period: Int, amp: Int, n: Int): Array[Short] =
    Array.tabulate(n)(i =>
      (if ((i / (period / 2)) % 2 == 0) amp else -amp).toShort)
}
