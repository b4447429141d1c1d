package graft

/** In-test MJPEG-AVI byte generation: minimal canonical RIFF('AVI ')
  * with a LIST(hdrl → avih) header and a LIST(movi) of 00dc JPEG
  * frames — the container shape VideoOps parses.
  */
object AviGen {

  def jpegFrame(img: java.awt.image.BufferedImage,
      quality: Float): Array[Byte] = {
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  def aviBytes(frames: Seq[Array[Byte]], w: Int, h: Int,
      usPerFrame: Int = 40000): Array[Byte] = {
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val pad = payload.length & 1
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("US-ASCII")).putInt(payload.length).put(payload)
      bb.array()
    }
    def list(subtype: String, children: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + children.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("LIST".getBytes("US-ASCII")).putInt(4 + children.length)
        .put(subtype.getBytes("US-ASCII")).put(children)
      bb.array()
    }
    val avih = {
      val bb = java.nio.ByteBuffer.allocate(56)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(0, usPerFrame)
      bb.putInt(16, frames.length)
      bb.putInt(24, 1) // dwStreams
      bb.putInt(32, w)
      bb.putInt(36, h)
      bb.array()
    }
    val hdrl = list("hdrl", chunk("avih", avih))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = hdrl ++ movi
    val bb = java.nio.ByteBuffer.allocate(12 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + body.length)
      .put("AVI ".getBytes("US-ASCII")).put(body)
    bb.array()
  }
}
