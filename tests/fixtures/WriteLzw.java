import javax.imageio.*;
import javax.imageio.stream.*;
import java.awt.image.*;
import java.io.*;
import java.util.Iterator;

/**
 * Writes LZW-compressed grayscale TIFFs with deterministic pixel content
 * (a fixed LCG so Python can reproduce the expected array exactly).
 * Usage: java WriteLzw <out.tif> <width> <height> <mode>
 * mode: lcg  -> pseudo-random bytes (fills the LZW table, forces resets)
 *       ramp -> bytes(range(256)) tiled (forces width growth w/ repeats)
 *       const-> all 7s (max redundancy, KwKwK chains)
 */
public class WriteLzw {
    public static void main(String[] args) throws Exception {
        String out = args[0];
        int w = Integer.parseInt(args[1]);
        int h = Integer.parseInt(args[2]);
        String mode = args[3];
        BufferedImage img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY);
        byte[] px = ((DataBufferByte) img.getRaster().getDataBuffer()).getData();
        long s = 12345L;
        for (int i = 0; i < px.length; i++) {
            if (mode.equals("lcg")) {
                s = (s * 6364136223846793005L + 1442695040888963407L);
                px[i] = (byte) (s >>> 33);
            } else if (mode.equals("ramp")) {
                px[i] = (byte) (i % 256);
            } else {
                px[i] = 7;
            }
        }
        Iterator<ImageWriter> it = ImageIO.getImageWritersByFormatName("TIFF");
        ImageWriter wr = it.next();
        ImageWriteParam p = wr.getDefaultWriteParam();
        p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
        p.setCompressionType("LZW");
        try (ImageOutputStream ios = ImageIO.createImageOutputStream(new File(out))) {
            wr.setOutput(ios);
            wr.write(null, new IIOImage(img, null, null), p);
        }
        wr.dispose();
        System.out.println("wrote " + out);
    }
}
